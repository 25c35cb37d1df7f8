package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  test("pairs are exactly the rank-window neighbors, ties broken by id") {
    // sort order by (key, id): 10(a) 30(a) 20(b) 40(c) 50(d) — the two
    // 'a' keys tie-break by id
    val d = Seq((10L, "a"), (20L, "b"), (30L, "a"), (40L, "c"), (50L, "d"))
      .toDF("id", "key")
    val got = Dedup.sortedNeighborhoodPairs(d, "id", "key", window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 30L), (10L, 20L), (30L, 20L), (30L, 40L),
      (20L, 40L), (20L, 50L), (40L, 50L)))
  }

  test("pair set is invariant to bucketing (cross-partition windows held)") {
    val d = (1 to 40).map(i => (i.toLong, f"k${(i * 7) % 40}%02d"))
      .toDF("id", "key")
    def pairs(buckets: Int) =
      Dedup.sortedNeighborhoodPairs(d, "id", "key", window = 3, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(1)
    assert(single.size == 3 * 40 - (1 + 2 + 3)) // n·w minus the tail
    assert(pairs(5) == single && pairs(13) == single)
  }

  test("window 1 yields adjacent-only pairs; empty input yields none") {
    val d = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "key")
    val got = Dedup.sortedNeighborhoodPairs(d, "id", "key", window = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 3L)))
    assert(Dedup.sortedNeighborhoodPairs(
      d.filter(col("id") > 99), "id", "key", 2).count() == 0L)
  }
}
