package graft.dedup

import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(d: org.apache.spark.sql.DataFrame) =
    Dedup.winnowFingerprints(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("identical documents select identical fingerprint sets") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val out = fps(Seq((1L, text), (2L, text)).toDF("doc_id", "text"))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(t => (t._2, t._3)).toSet ==
      byDoc(2L).map(t => (t._2, t._3)).toSet)
    assert(byDoc(1L).nonEmpty)
  }

  test("a shared run of w+k-1 chars guarantees a common hash; strangers share none") {
    val shared = "identical stolen paragraph content preserved verbatim here"
    val a = s"totally original opening words $shared and an original ending"
    val b = s"different framing text around $shared with other conclusions"
    // disjoint alphabet (digits only) — zero shared 5-grams by
    // construction; any word text can share an incidental selected gram
    val c = "12345 67890 13579 24680 11223 34455 56677 88990 09876 54321"
    val out = fps(Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"))
    val h = out.groupBy(_._1).map { case (d, v) => d -> v.map(_._3).toSet }
    assert((h(1L) & h(2L)).nonEmpty) // the winnowing guarantee
    assert((h(1L) & h(3L)).isEmpty && (h(2L) & h(3L)).isEmpty)
  }

  test("density: at most one fingerprint per window, at least one per doc; short text kept") {
    val d = Seq((1L, "a short but long enough piece of sample text for density checks"),
      (2L, "tiny")).toDF("doc_id", "text")
    val out = fps(d)
    val byDoc = out.groupBy(_._1)
    val nGrams1 = byDoc(1L).map(_._2).max // positions are 1-based in-range
    assert(byDoc(1L).size <= nGrams1)
    assert(byDoc(2L).size == 1) // shorter than one window → global min
  }

  test("winnow matches a brute-force window-min reference on random text") {
    // Exact replay of the documented contract: per k-gram key =
    // md5-60bit(gram)·2²⁰ + pos, sliding min over w grams, window starts
    // 1..max(ng−w+1, 1), distinct winners. Random single-spaced
    // lowercase text keeps normalizeText an identity, so the reference
    // grams equal the engine's.
    val k = 5; val w = 4
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val rnd = new scala.util.Random(5501)
    val docs = (0 until 8).map { i =>
      val words = Seq.fill(4 + rnd.nextInt(25))(
        Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(5)).toChar).mkString)
      (i.toLong, words.mkString(" "))
    }
    val engine = fps(docs.toDF("doc_id", "text"))
      .map(t => (t._1, t._2, t._3)).toSet
    val expected = docs.flatMap { case (id, text) =>
      val ng = math.max(text.length - (k - 1), 1)
      val keys = (1 to ng).map(p =>
        BigInt(h60(text.slice(p - 1, p - 1 + k))) * 1048576 + p)
      val starts = 1 to math.max(ng - (w - 1), 1)
      starts.map(s => keys.slice(s - 1, math.min(s - 1 + w, ng)).min)
        .distinct
        .map(key => (id, (key % 1048576).toLong, (key / 1048576).toLong))
    }.toSet
    assert(engine == expected,
      s"engine-only=${engine -- expected}, ref-only=${expected -- engine}")
  }
}
