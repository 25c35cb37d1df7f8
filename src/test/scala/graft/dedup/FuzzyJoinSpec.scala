package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(l: Seq[(Long, String)], r: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Long)] = {
    val ldf = l.toDF("a_id", "a_str")
    val rdf = r.toDF("b_id", "b_str")
    ldf.crossJoin(rdf)
      .withColumn("d", levenshtein(col("a_str"), col("b_str")).cast("long"))
      .filter(col("d") <= k)
      .select("a_id", "b_id", "d").as[(Long, Long, Long)].collect().toSet
  }

  private def fuzzy(l: Seq[(Long, String)], r: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.editDistancePairs(
        l.toDF("id", "str"), r.toDF("id", "str"), maxDist = k)
      .select("a_id", "b_id", "edit_dist")
      .as[(Long, Long, Long)].collect().toSet

  test("differential vs the naive join on noisy strings, incl. shorts") {
    val rnd = new scala.util.Random(23)
    val alpha = "abcde"
    def word(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // lengths 0..12 — crosses the q(k+1) short/long boundary both ways
    val pool = (1L to 150L).map(i => (i, word(rnd.nextInt(13))))
    val a = pool.take(90)
    val b = pool.drop(60)
    for (k <- Seq(0, 1, 2)) {
      assert(fuzzy(a, b, k) == naive(a, b, k), s"maxDist=$k")
    }
  }

  test("short-short pairs with zero shared grams are still found") {
    // "ab" vs "cd": edit 2, no common 2-gram — the count-filter blind spot
    val l = Seq((1L, "ab"))
    val r = Seq((2L, "cd"), (3L, "abcdef"))
    assert(fuzzy(l, r, 2) == Set((1L, 2L, 2L)))
  }

  test("long pairs ride the prefix join; edit_dist is exact") {
    val l = Seq((1L, "small ring"), (2L, "red widget"))
    val r = Seq((3L, "small rings"), (4L, "red widgets"), (5L, "blue bolt"))
    assert(fuzzy(l, r, 1) == Set((1L, 3L, 1L), (2L, 4L, 1L)))
  }

  test("null and empty strings: nulls never match, empties pair with shorts") {
    val l = Seq((1L, null.asInstanceOf[String]), (2L, ""))
    val r = Seq((3L, "a"), (4L, ""))
    assert(fuzzy(l, r, 1) == Set((2L, 3L, 1L), (2L, 4L, 0L)))
  }

  test("exact-match mode (maxDist = 0)") {
    val l = Seq((1L, "alpha"), (2L, "x"))
    val r = Seq((3L, "alpha"), (4L, "x"), (5L, "y"))
    assert(fuzzy(l, r, 0) == Set((1L, 3L, 0L), (2L, 4L, 0L)))
  }
}
