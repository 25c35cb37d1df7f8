package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers: median ± k·MAD, hand-checked") {
    // median 5.5; deviations sorted give MAD 2.5 → outlier iff |x−5.5|>7.5
    val d = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _)).toDF("g", "x")
    val out = RobustStats.madOutliers(d, Seq("g"), "x")
      .collect().map(r => r.getDouble(1) -> r.getBoolean(2)).toMap
    assert(out(100.0) && out.count(_._2) == 1)
  }

  test("madOutliers: zero-MAD group flags any deviation; groups independent") {
    // {5,5,5,9}: MAD 0 → 9 is an outlier at any k; wide group unaffected
    val d = (Seq(5.0, 5.0, 5.0, 9.0).map(("a", _)) ++
      Seq(10.0, 20.0, 30.0, 40.0).map(("b", _))).toDF("g", "x")
    val out = RobustStats.madOutliers(d, Seq("g"), "x")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    assert(out(("a", 9.0)))
    assert(!out(("a", 5.0)))
    assert(Seq(10.0, 20.0, 30.0, 40.0).forall(v => !out(("b", v))))
  }

  test("madOutliers matches a classical z-score screen on symmetric data but survives contamination") {
    // 10% gross contamination: mean/stddev screen misses planted spikes
    // (masking), the MAD screen does not
    val base = (1 to 90).map(i => ("g", 50.0 + (i % 11) - 5))
    val spikes = (1 to 10).map(i => ("g", 10000.0 + i))
    val d = (base ++ spikes).toDF("g", "x")
    val mad = RobustStats.madOutliers(d, Seq("g"), "x")
      .filter(col("is_outlier")).collect().map(_.getDouble(1)).toSet
    assert(spikes.map(_._2).toSet.subsetOf(mad))
    assert(mad.forall(_ > 9000)) // no false flags on the base cluster
  }
}
