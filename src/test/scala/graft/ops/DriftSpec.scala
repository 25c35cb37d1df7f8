package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("driftReport: fully separated bins give the hand-computed PSI/KL") {
    // P = {0.5, 0.5} (bin 0), Q = {1.5, 1.5} (bin 1), B = 2, N+B = 4.
    // bin0: wp = 3·4 = 12, wq = 1·4 = 4, lnm = round(ln 3 · 1e6) = 1098612
    // bin1: wp = 4, wq = 12, lnm = −1098612
    // S = (12−4)·1098612 + (4−12)·(−1098612) = 17577792; D = 16
    // psi = 17577792/16 = 1098612 exactly; K = 3·1098612 − 1098612,
    // kl = 2197224/4 = 549306 exactly
    val d = Seq(("g", 0.5, true), ("g", 0.5, true),
      ("g", 1.5, false), ("g", 1.5, false)).toDF("g", "v", "exp")
    val r = Drift.driftReport(d, Seq("g"), "v", "exp", 1.0, 2).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 1098612L)
    assert(r.getLong(4) == 549306L)
  }

  test("driftReport: identical distributions score zero") {
    val d = Seq(("g", 0.5, true), ("g", 1.5, true),
      ("g", 0.5, false), ("g", 1.5, false)).toDF("g", "v", "exp")
    val r = Drift.driftReport(d, Seq("g"), "v", "exp", 1.0, 2).collect().head
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
  }

  test("driftReport: bins empty on BOTH sides still carry smoothed mass") {
    // P = 3 rows bin0, Q = 1 row bin0, nBins = 2: bin1 is empty on both
    // sides but contributes (wp=3, wq=5) because N_P ≠ N_Q. Replicating
    // the integer algebra here pins that the empty bin is NOT dropped.
    val d = (Seq.fill(3)(("g", 0.5, true)) :+ ("g", 0.5, false))
      .toDF("g", "v", "exp")
    val r = Drift.driftReport(d, Seq("g"), "v", "exp", 1.0, 2).collect().head
    val ln0 = math.round(math.log(12.0 / 10.0) * 1e6) // bin0: wp=4·3, wq=2·5
    val ln1 = math.round(math.log(3.0 / 5.0) * 1e6)   // bin1: wp=1·3, wq=1·5
    val s = (12L - 10L) * ln0 + (3L - 5L) * ln1
    val k = 4L * ln0 + 1L * ln1
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L)
    assert(r.getLong(3) == math.floor(s.toDouble / 15.0).toLong)
    assert(r.getLong(4) == math.floor(k.toDouble / 5.0).toLong)
  }

  test("ksTest: disjoint supports hit D = 1; identical samples score 0") {
    val d = (Seq(("sep", true, 1.0), ("sep", true, 2.0),
      ("sep", false, 3.0), ("sep", false, 4.0)) ++
      Seq(("same", true, 1.0), ("same", true, 2.0),
        ("same", false, 1.0), ("same", false, 2.0)))
      .toDF("g", "arm", "v")
    val out = Drift.ksTest(d, Seq("g"), "arm", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("sep").getLong(1) == 2L && out("sep").getLong(2) == 2L)
    assert(out("sep").getLong(3) == 1000000L)
    assert(out("same").getLong(3) == 0L)
  }

  test("ksTest: the max CDF gap lands mid-distribution; empty arm is NULL") {
    // A {1,2,3} vs B {2,3,4}: D = 1/3, attained at v = 1, 2 and 3
    val d = (Seq(1.0, 2.0, 3.0).map(("g", true, _)) ++
      Seq(2.0, 3.0, 4.0).map(("g", false, _)) :+
      ("empty", true, 5.0)).toDF("g", "arm", "v")
    val out = Drift.ksTest(d, Seq("g"), "arm", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getLong(3) == 333333L)
    assert(out("empty").isNullAt(3))
  }

  test("jsDivergence: fully separated bins give the hand-computed score") {
    // P = {0.5, 0.5} (bin 0), Q = {1.5, 1.5} (bin 1), B = 2, N+B = 4,
    // D = 16. bin0: wp = 12, wq = 4 → lnp = round(ln 1.5·1e6) = 405465,
    // lnq = round(ln 0.5·1e6) = −693147; bin1 mirrors. S = 2·(12·405465
    // + 4·(−693147)) = 4185984; js = ⌊S/(2·16)⌋ = 130812.
    val d = Seq(("g", 0.5, true), ("g", 0.5, true),
      ("g", 1.5, false), ("g", 1.5, false)).toDF("g", "v", "exp")
    val r = Drift.jsDivergence(d, Seq("g"), "v", "exp", 1.0, 2)
      .collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 130812L)
  }

  test("jsDivergence: identical distributions score zero; swap-symmetric") {
    val same = Seq(("g", 0.5, true), ("g", 1.5, true),
      ("g", 0.5, false), ("g", 1.5, false)).toDF("g", "v", "exp")
    assert(Drift.jsDivergence(same, Seq("g"), "v", "exp", 1.0, 2)
      .collect().head.getLong(3) == 0L)
    // Asymmetric data: the score must be invariant under P↔Q.
    val d = (Seq.fill(3)(("g", 0.5, true)) :+ ("g", 1.5, false))
      .toDF("g", "v", "exp")
    val sw = d.withColumn("exp", !col("exp"))
    val a = Drift.jsDivergence(d, Seq("g"), "v", "exp", 1.0, 2)
      .collect().head.getLong(3)
    val b = Drift.jsDivergence(sw, Seq("g"), "v", "exp", 1.0, 2)
      .collect().head.getLong(3)
    assert(a == b && a > 0L)
  }

  test("benfordDigits: hand-counted digits, non-positives excluded") {
    // scale 100: 1.23→123(d1), 15.0→1500(d1), 2.5→250(d2), 9.99→999(d9);
    // 0.0, −3.0, null are excluded. N = 4.
    val d = Seq(Some(1.23), Some(15.0), Some(2.5), Some(9.99), Some(0.0),
      Some(-3.0), None).toDF("v")
    val rows = Drift.benfordDigits(d, "v").orderBy("digit").collect()
    assert(rows.length == 9)
    val byDigit = rows.map(r => r.getInt(0) -> r).toMap
    assert(byDigit(1).getLong(1) == 2L &&
      byDigit(1).getLong(2) == 500000L)
    assert(byDigit(2).getLong(1) == 1L &&
      byDigit(2).getLong(2) == 250000L)
    assert(byDigit(9).getLong(1) == 1L)
    assert(byDigit(3).getLong(1) == 0L && byDigit(3).getLong(2) == 0L)
    // benford_micro is the definitional constant; dev = |share − benford|
    assert(byDigit(1).getLong(3) == 301030L &&
      byDigit(1).getLong(4) == 198970L)
    assert(byDigit(3).getLong(4) == 124939L)
  }

  test("benfordDigits: all rows excluded still yields the 9-row frame") {
    val d = Seq(Some(0.0), Some(-1.0), None).toDF("v")
    val rows = Drift.benfordDigits(d, "v").orderBy("digit").collect()
    assert(rows.length == 9)
    assert(rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
    assert(rows.map(_.getLong(3)).sum == 1000000L)
  }

  test("driftReport: values clamp into the edge bins") {
    // −5 clamps to bin 0, 99 clamps to bin 1 (nBins = 2, width 1): the
    // same frame as the hand-computed test, so the scores must match it.
    val d = Seq(("g", -5.0, true), ("g", 0.5, true),
      ("g", 99.0, false), ("g", 1.5, false)).toDF("g", "v", "exp")
    val r = Drift.driftReport(d, Seq("g"), "v", "exp", 1.0, 2).collect().head
    assert(r.getLong(3) == 1098612L && r.getLong(4) == 549306L)
  }
}
