package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the approx↔exact agreement of the sketched RobustStats twins
  * ([[RobustStats.madOutliersApprox]], [[RobustStats.trimmedStatsApprox]])
  * — `percentile_approx` returns an OBSERVED value where the exact
  * percentile interpolates, so the contract is fence closeness (one
  * inter-sample gap) and exact equality where no interpolation happens,
  * mirroring RobustNormalizeApproxSpec.
  */
class RobustStatsApproxSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliersApprox equals exact on odd counts (no interpolation)") {
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0))
      .toDF("g", "x")
    val ex = RobustStats.madOutliers(d, Seq("g"), "x")
      .collect().map(r => r.getDouble(1) -> r.getBoolean(2)).toMap
    val ap = RobustStats.madOutliersApprox(d, Seq("g"), "x")
      .collect().map(r => r.getDouble(1) -> r.getBoolean(2)).toMap
    assert(ap == ex)
    assert(ex(100.0) && !ex(2.0))
  }

  test("trimmedStatsApprox: full-width fences make both twins the plain mean") {
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "x")
    val ex = RobustStats.trimmedStats(d, Seq("g"), "x", 0.0, 1.0).collect().head
    val ap = RobustStats.trimmedStatsApprox(d, Seq("g"), "x", 0.0, 1.0).collect().head
    assert(ex == ap)
    assert(ap.getLong(3) == 2000000L) // mean 2.0 in micro units
  }

  test("approx fences land within one quant step of exact on the events table") {
    val ev = graft.Tables.load(spark, sf001, "events")
      .filter(col("value").isNotNull)
    def fences(pct: (org.apache.spark.sql.Column, Double) => org.apache.spark.sql.Column) =
      ev.groupBy(col("event_type")).agg(
        pct(col("value"), 0.05).cast("double").as("lo"),
        pct(col("value"), 0.95).cast("double").as("hi"))
    val ex = fences((c, p) => percentile(c, lit(p)))
    val ap = fences((c, p) => percentile_approx(c, lit(p), lit(10000)))
    // The bound is one LOCAL inter-sample gap (GK observed value vs the
    // exact interpolation): dense at p5 (measured ≤ 0.45 across groups),
    // sparse at p95 of this heavy-tail metric (measured ≤ 6 at n≈200 —
    // the gap shrinks as 1/density with group size, so the approx twin
    // only gets TIGHTER at the 100 TB widths it exists for).
    val drift = ex.as("e").join(ap.as("a"), Seq("event_type"))
      .filter(abs($"e.lo" - $"a.lo") > 1.0 || abs($"e.hi" - $"a.hi") > 10.0)
    assert(drift.count() === 0)
  }

  test("output contracts match the exact twins exactly") {
    val ev = graft.Tables.load(spark, sf001, "events")
    val exT = RobustStats.trimmedStats(ev, Seq("event_type"), "value")
    val apT = RobustStats.trimmedStatsApprox(ev, Seq("event_type"), "value")
    assert(apT.schema == exT.schema && apT.count() == exT.count())
    val exM = RobustStats.madOutliers(ev, Seq("event_type"), "value")
    val apM = RobustStats.madOutliersApprox(ev, Seq("event_type"), "value")
    assert(apM.schema == exM.schema && apM.count() == exM.count())
  }
}
