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

  test("linkageClusters: transitive closure over matches; singletons self-label") {
    // 1-2 and 2-5 match (5 is a third jon smith variant) but 1-5 was
    // never scored — transitivity must still put all three together.
    val recs5 = recs.union(Seq((5L, "jon smith", "nyc")).toDF("id", "name", "city"))
    val scored = Dedup.linkageScores(
      Seq((1L, 2L), (2L, 5L), (1L, 4L)).toDF("a", "b"), recs5, "id",
      Seq(("name", 2000000L, -1500000L), ("city", 1000000L, -400000L)),
      maxDist = 1, threshold = 2500000L)
    val out = Dedup.linkageClusters(scored, recs5, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 3L -> 3L, 4L -> 4L))
  }

  test("goldenRecords: per-field mode, ties to smallest, all-null stays null") {
    val members = Seq(
      (1L, "john smith", null: String),
      (2L, "john smith", null: String),
      (3L, "jon smith", null: String),
      (10L, "solo", "sf")).toDF("id", "name", "city")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L)).toDF("id", "cluster_id")
    val out = Dedup.goldenRecords(members, clusters, "id", Seq("name", "city"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.getString(2)), Option(r.getString(3))))).toMap
    // majority name wins; city null across cluster 1 stays null
    assert(out(1L) == ((3L, Some("john smith"), None)))
    assert(out(10L) == ((1L, Some("solo"), Some("sf"))))
  }

  test("goldenRecords tie-break elects the smallest value") {
    val members = Seq((1L, "b"), (2L, "a")).toDF("id", "name")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")
    val out = Dedup.goldenRecords(members, clusters, "id", Seq("name")).collect()
    assert(out.head.getString(2) == "a")
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

  test("blockingEval: hand-computed triple; orientation/self-pair noise") {
    // 5 records, candidates {(1,2),(2,3)} after canonicalization (the
    // (2,1) dup and (4,4) self-pair drop), truth {(1,2),(3,4)} → hit 1.
    val records = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val cand = Seq((1L, 2L), (2L, 1L), (2L, 3L), (4L, 4L)).toDF("a", "b")
    val truth = Seq((2L, 1L), (3L, 4L)).toDF("a", "b")
    val r = Dedup.blockingEval(records, "id", cand, truth).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L && r.getLong(4) == 1L)
    assert(r.getLong(5) == 800000L)
    assert(r.getLong(6) == 500000L)
    assert(r.getLong(7) == 500000L)
  }

  test("blockingEval: empty truth/candidates yield NULL ratios, not errors") {
    val records = Seq(1L, 2L).toDF("id")
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    val r = Dedup.blockingEval(records, "id",
      Seq((1L, 2L)).toDF("a", "b"), none).collect().head
    assert(r.isNullAt(6))
    assert(r.getLong(7) == 0L)
    val r2 = Dedup.blockingEval(records, "id", none, none).collect().head
    assert(r2.isNullAt(6) && r2.isNullAt(7))
    assert(r2.getLong(5) == 1000000L)
  }
}
