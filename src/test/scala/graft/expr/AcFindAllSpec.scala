package graft.expr

import graft.{GraftFunctions, SparkSpec}
import org.apache.spark.sql.functions._

class AcFindAllSpec extends SparkSpec {
  import spark.implicits._

  private def find(text: String, dict: Seq[String]): Seq[(String, Int)] =
    Seq(text).toDF("t")
      .select(explode(GraftFunctions.acFindAll(col("t"), dict)).as("m"))
      .select(col("m.term"), col("m.pos"))
      .as[(String, Int)].collect().toSeq

  test("nested terms all report with 1-based positions") {
    val r = find("a scan here", Seq("scan", "can", "an"))
    assert(r.toSet == Set(("scan", 3), ("can", 4), ("an", 5)))
  }

  test("overlapping occurrences of one term all report") {
    assert(find("aaaa", Seq("aa")) == Seq(("aa", 1), ("aa", 2), ("aa", 3)))
  }

  test("failure links carry matches across branch switches") {
    // after reading "she", failing from the s-h-e branch must still
    // find "he"; then "hers" via the h-e-r-s branch
    val r = find("shers", Seq("she", "he", "hers"))
    assert(r.toSet == Set(("she", 1), ("he", 2), ("hers", 2)))
  }

  test("phrase terms match across spaces; scan order is by end position") {
    val r = find("the line is fine", Seq("the line", "line", "in", "fine"))
    assert(r == Seq(("in", 6), ("the line", 1), ("line", 5),
      ("in", 14), ("fine", 13)))
  }

  test("no match on empty text; a term longer than the text never fires") {
    assert(find("", Seq("x")).isEmpty)
    assert(find("ab", Seq("abc")).isEmpty)
  }

  test("fuzz: matches a naive all-positions scan on random nested dictionaries") {
    // Terms of length 1-4 over a 3-letter alphabet: nesting ("ab" inside
    // "abb"), self-overlap ("aa" in "aaa"), and shared prefixes are the
    // norm, so failure links and output chains are exercised constantly.
    // The reference is an independent naive scan: every term at every
    // start position, overlapping occurrences included.
    for (trial <- 0 until 4) {
      val rnd = new scala.util.Random(5800 + trial)
      val alpha = "abc"
      def word(n: Int): String =
        (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val dict = (0 until 3 + rnd.nextInt(10))
        .map(_ => word(1 + rnd.nextInt(4))).distinct
      for (_ <- 0 until 5) {
        val text = word(rnd.nextInt(40))
        val got = find(text, dict).toSet
        val want = dict.flatMap { t =>
          Iterator.iterate(text.indexOf(t))(i => text.indexOf(t, i + 1))
            .takeWhile(_ >= 0).map(i => (t, i + 1)).toSeq // 1-based
        }.toSet
        assert(got == want,
          s"trial $trial text='$text' dict=$dict: got=$got want=$want")
      }
    }
  }

  test("dictionaryTag aggregates hits and first positions per doc") {
    val df = Seq((1L, "Scan the scan!"), (2L, "nothing here")).toDF("doc_id", "text")
    val r = graft.text.TextAnalysis
      .dictionaryTag(df, "doc_id", "text", Seq("scan", "an", "not"))
      .orderBy(col("doc"), col("term"))
      .as[(Long, String, Long, Long)].collect().toSeq
    // normalized: "scan the scan" → scan@1,10 an@3,12; doc 2: not@1
    assert(r == Seq((1L, "an", 2L, 3L), (1L, "scan", 2L, 1L),
      (2L, "not", 1L, 1L)))
  }

  test("dictionaryTag returns the CALLER'S spelling, first per normalized key") {
    val df = Seq((1L, "send an e mail or an E Mail")).toDF("doc_id", "text")
    // "E-mail" and "e.mail" both normalize to "e mail"; the first
    // original spelling wins, and results join back to caller strings.
    val r = graft.text.TextAnalysis
      .dictionaryTag(df, "doc_id", "text", Seq("E-mail", "e.mail", "AN"))
      .orderBy(col("term"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq((1L, "AN", 2L, 6L), (1L, "E-mail", 2L, 9L)))
  }

  test("dictionaryTag drops null terms; all-null/empty dictionary rejects") {
    val df = Seq((1L, "an apple")).toDF("doc_id", "text")
    val r = graft.text.TextAnalysis
      .dictionaryTag(df, "doc_id", "text", Seq(null, "an", "...."))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq((1L, "an", 1L, 1L)))
    intercept[IllegalArgumentException] {
      graft.text.TextAnalysis.dictionaryTag(df, "doc_id", "text",
        Seq(null, "...."))
    }
  }
}
