package graft.dedup

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val recs = Seq(
    (1L, "jon smith", "nyc"),
    (2L, "john smith", "nyc"), // name within edit distance 1 of jon
    (3L, "jane doe", null: String),
    (4L, "mary major", "chicago")).toDF("id", "name", "city")

  private def scores(pairs: Seq[(Long, Long)], maxDist: Int = 1) =
    Dedup.linkageScores(
        pairs.toDF("a", "b"), recs, "id",
        Seq(("name", 2000000L, -1500000L), ("city", 1000000L, -400000L)),
        maxDist, threshold = 2500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap

  test("agreement/disagreement/missing weights sum exactly; threshold splits") {
    val out = scores(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(out((1L, 2L)) == (3000000L, true)) // fuzzy name + exact city
    assert(out((1L, 3L)) == (-1500000L, false)) // name off, city missing → 0
    assert(out((1L, 4L)) == (-1900000L, false)) // both disagree
  }

  test("maxDist is a hard boundary: distance 1 agrees at 1, disagrees at 0") {
    assert(scores(Seq((1L, 2L)), maxDist = 1)((1L, 2L))._1 == 3000000L)
    assert(scores(Seq((1L, 2L)), maxDist = 0)((1L, 2L))._1 == -500000L)
  }

  test("composes with sorted-neighborhood blocking end to end") {
    val pairs = Dedup.sortedNeighborhoodPairs(recs, "id", "name", window = 2)
    val out = Dedup.linkageScores(pairs, recs, "id",
      Seq(("name", 2000000L, -1500000L)), maxDist = 1)
    // blocking sorts jon/john adjacent; the scorer finds them (pair
    // direction follows the name sort order, so john precedes jon)
    val m = out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m.get((1L, 2L)).orElse(m.get((2L, 1L))).contains(2000000L))
  }
}
