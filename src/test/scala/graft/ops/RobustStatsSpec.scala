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

  test("trimmedStats: hand-checked fences, trimmed and winsorized means") {
    // 1..10 at (0.1, 0.9): fences 1.9 / 9.1 → keep 2..9 (mean 5.5);
    // winsorizing clamps 1→1.9 and 10→9.1 → mean also exactly 5.5
    val d = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "x")
    val r = RobustStats.trimmedStats(d, Seq("g"), "x", 0.1, 0.9).collect().head
    assert(r.getLong(1) == 10L && r.getLong(2) == 8L)
    assert(r.getLong(3) == 5500000L && r.getLong(4) == 5500000L)
  }

  test("trimmedStats: empty trim window yields NULL trimmed mean, winsor still defined") {
    // {0, 100} at (0.05, 0.95): fences 5/95 contain no value → trimmed
    // NULL; winsorized mean = (5 + 95) / 2 = 50
    val d = Seq(("g", 0.0), ("g", 100.0)).toDF("g", "x")
    val r = RobustStats.trimmedStats(d, Seq("g"), "x").collect().head
    assert(r.getLong(2) == 0L && r.isNullAt(3))
    assert(r.getLong(4) == 50000000L)
  }

  test("trimmedStats ignores null values and keeps groups independent") {
    val d = (Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None)) ++ (1 to 10).map(i => ("b", Some(i * 10.0))))
      .toDF("g", "x")
    val out = RobustStats.trimmedStats(d, Seq("g"), "x", 0.0, 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 3L) // null row never counted
    assert(out("a").getLong(3) == 2000000L) // untrimmed mean of 1,2,3
    assert(out("b").getLong(3) == 55000000L)
  }

  test("shrunkMeans: hand-checked pull toward the global mean") {
    // global mean 17.5 over {10, 20, 20, 20}; k=2:
    // a (n=1): (10·4 + 2·70)/(4·3) = 15; b (n=3): (60·4 + 2·70)/(4·5) = 19
    val d = (Seq(("a", 10.0)) ++ Seq.fill(3)(("b", 20.0))).toDF("g", "x")
    val out = RobustStats.shrunkMeans(d, Seq("g"), "x", priorWeight = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(2) == 10000000L)
    assert(out("a").getLong(3) == 15000000L)
    assert(out("b").getLong(2) == 20000000L)
    assert(out("b").getLong(3) == 19000000L)
  }

  test("shrunkMeans: zero prior weight is the raw mean; nulls ignored") {
    val d = Seq(("a", Some(1.5)), ("a", Some(2.5)), ("a", None),
      ("b", Some(7.0))).toDF("g", "x")
    val out = RobustStats.shrunkMeans(d, Seq("g"), "x", priorWeight = 0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 2L)
    assert(out("a").getLong(2) == 2000000L && out("a").getLong(3) == 2000000L)
    assert(out("b").getLong(3) == 7000000L)
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

  test("mergeableStats: merge of shard partials equals the direct stats") {
    import spark.implicits._
    val rows = (1 to 200).map(i => ("g", i % 7, i * 1.25))
    val out = RobustStats.mergeableStats(rows.toDF("g", "shard", "v"),
      Seq("g"), "shard", "v").collect().head
    def f(c: String) = out.getLong(out.fieldIndex(c))
    val cents = (1 to 200).map(i => math.floor(i * 1.25 * 100).toLong)
    val n = cents.length.toLong
    assert(f("n_shards") == 7L && f("n") == n)
    assert(f("sum_cents") == cents.sum)
    assert(f("mean_cents") == cents.sum / n)
    val num = BigInt(n) * cents.map(c => BigInt(c) * c).sum -
      BigInt(cents.sum) * cents.sum
    assert(f("var_cents2") == (num / (BigInt(n) * n)).toLong)
    assert(f("min_cents") == cents.min && f("max_cents") == cents.max)
  }

  test("mergeableStats: single-shard groups and null values") {
    import spark.implicits._
    val df = Seq(("a", 1, Some(2.0)), ("a", 1, None), ("b", 3, Some(5.5)))
      .toDF("g", "shard", "v")
    val out = RobustStats.mergeableStats(df, Seq("g"), "shard", "v")
      .orderBy("g").collect()
    assert(out(0).getLong(out(0).fieldIndex("n")) == 1L) // null dropped
    assert(out(1).getLong(out(1).fieldIndex("var_cents2")) == 0L)
  }

  test("giniCoefficient: uniform is 0, concentrated approaches 1, " +
      "hand value in between") {
    import spark.implicits._
    // even {5,5,5,5} → 0; one-holds-all {0,0,0,12} → (n−1)/n = 0.75;
    // {1,2,3,4}: Σ(2i−n−1)x = −3·1 −1·2 +1·3 +3·4 = 10, n·Σx = 40 → 0.25
    val df = (Seq.fill(4)(("even", 5L)) ++
      Seq(("conc", 0L), ("conc", 0L), ("conc", 0L), ("conc", 12L)) ++
      Seq(("mid", 1L), ("mid", 2L), ("mid", 3L), ("mid", 4L)))
      .toDF("g", "x")
    val out = RobustStats.giniCoefficient(df, Seq("g"), "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("even").getLong(out("even").fieldIndex("gini_micro")) == 0L)
    assert(out("conc").getLong(out("conc").fieldIndex("gini_micro")) == 750000L)
    assert(out("mid").getLong(out("mid").fieldIndex("gini_micro")) == 250000L)
    assert(out("mid").getLong(out("mid").fieldIndex("sum_val")) == 10L)
  }

  test("giniCoefficient: all-zero group reports NULL; ties are " +
      "order-invariant") {
    import spark.implicits._
    val df = (Seq(("zero", 0L), ("zero", 0L)) ++
      Seq(("tie", 3L), ("tie", 3L), ("tie", 0L))).toDF("g", "x")
    val out = RobustStats.giniCoefficient(df, Seq("g"), "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("zero").isNullAt(out("zero").fieldIndex("gini_micro")))
    // {0,3,3}: Σ(2i−n−1)x = −2·0 + 0·3 + 2·3 = 6; n·Σx = 18 → 1/3
    assert(out("tie").getLong(out("tie").fieldIndex("gini_micro")) == 333333L)
  }

  test("concentrationIndex: HHI endpoints 1/k and 1, top share, NULLs " +
      "on an all-zero group") {
    import spark.implicits._
    val df = (Seq.fill(4)(("even", 5L)) ++
      Seq(("conc", 0L), ("conc", 0L), ("conc", 0L), ("conc", 12L)) ++
      Seq(("zero", 0L), ("zero", 0L))).toDF("g", "x")
    val out = RobustStats.concentrationIndex(df, Seq("g"), "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("even").getLong(out("even").fieldIndex("hhi_micro")) == 250000L)
    assert(out("even").getLong(
      out("even").fieldIndex("top_share_micro")) == 250000L)
    assert(out("conc").getLong(out("conc").fieldIndex("hhi_micro")) == 1000000L)
    assert(out("conc").getLong(
      out("conc").fieldIndex("top_share_micro")) == 1000000L)
    assert(out("zero").isNullAt(out("zero").fieldIndex("hhi_micro")))
    assert(out("zero").isNullAt(out("zero").fieldIndex("top_share_micro")))
  }
}
