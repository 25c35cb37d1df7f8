package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** Pins the round-9 causal/survival additions: diff-in-diff cell
  * algebra, the PAV minimax identity (pooling and no-op cases), and the
  * Kaplan–Meier micro-nat curve against hand-computed values.
  */
class CausalSurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("diffInDiff: hand-computed four-cell estimate") {
    val d = Seq(
      ("g", true, false, 10.0), ("g", true, true, 20.0),
      ("g", false, false, 1.0), ("g", false, true, 2.0))
      .toDF("g", "arm", "post", "y")
    val r = Regression.diffInDiff(d, Seq("g"), "arm", "post", "y")
      .collect().head
    assert(r.getAs[Long]("n_t_pre") == 1L && r.getAs[Long]("n_c_post") == 1L)
    assert(r.getAs[Long]("mean_t_post_micro") == 20000000L)
    // (20 − 10) − (2 − 1) = 9
    assert(r.getAs[Long]("did_micro") == 9000000L)
  }

  test("diffInDiff: an empty cell NULLs its mean and the estimate") {
    val d = Seq(("g", true, false, 10.0), ("g", true, true, 20.0),
      ("g", false, true, 2.0)).toDF("g", "arm", "post", "y")
    val r = Regression.diffInDiff(d, Seq("g"), "arm", "post", "y")
      .collect().head
    assert(r.getAs[Long]("n_c_pre") == 0L)
    assert(r.isNullAt(r.fieldIndex("mean_c_pre_micro")))
    assert(r.isNullAt(r.fieldIndex("did_micro")))
  }

  private def calib(rows: Seq[(Double, Int, Int)]): Seq[Row] = {
    // (bin center score, n, positives) → exploded labeled rows
    val d = rows.flatMap { case (s, n, pos) =>
      (0 until n).map(i => ("g", s, i < pos))
    }.toDF("g", "score", "label")
    Regression.isotonicCalibration(d, Seq("g"), "score", "label", nBins = 10)
      .orderBy(col("bin")).collect().toSeq
  }

  test("isotonicCalibration: monotone input is returned unchanged") {
    val out = calib(Seq((0.05, 10, 1), (0.15, 10, 5), (0.25, 10, 9)))
    assert(out.map(_.getAs[Long]("iso_micro")) ==
      Seq(100000L, 500000L, 900000L))
    assert(out.map(_.getAs[Long]("rate_micro")) ==
      Seq(100000L, 500000L, 900000L))
  }

  test("isotonicCalibration: a violating run pools to its weighted average") {
    // rates .2, .6, .4 → PAV pools the last two to (6+4)/20 = .5
    val out = calib(Seq((0.05, 10, 2), (0.15, 10, 6), (0.25, 10, 4)))
    assert(out.map(_.getAs[Long]("iso_micro")) ==
      Seq(200000L, 500000L, 500000L))
  }

  test("isotonicCalibration: unequal weights pool to the weighted mean") {
    // .6 over n=10 then .2 over n=30 → (6+6)/40 = .3 on both bins
    val out = calib(Seq((0.05, 10, 6), (0.15, 30, 6)))
    assert(out.map(_.getAs[Long]("iso_micro")) == Seq(300000L, 300000L))
  }

  test("kaplanMeier: hand-computed micro-nat curve with censoring") {
    val d = Seq(("g", 1L, true), ("g", 1L, false), ("g", 2L, true),
      ("g", 3L, false)).toDF("g", "dur", "ev")
    val out = Survival.kaplanMeier(d, Seq("g"), "dur", "ev")
      .orderBy(col("t")).collect()
    assert(out.map(_.getAs[Long]("at_risk")).toSeq == Seq(4L, 2L, 1L))
    assert(out.map(_.getAs[Long]("events")).toSeq == Seq(1L, 1L, 0L))
    assert(out.map(_.getAs[Long]("censored")).toSeq == Seq(1L, 0L, 1L))
    val ln34 = math.round(math.log(3.0 / 4.0) * 1e6)
    val ln12 = math.round(math.log(1.0 / 2.0) * 1e6)
    assert(out.map(_.getAs[Long]("km_log_micro")).toSeq ==
      Seq(ln34, ln34 + ln12, ln34 + ln12))
  }

  test("kaplanMeier: a step that kills everyone NULLs the curve") {
    val d = Seq(("g", 1L, true), ("g", 1L, true)).toDF("g", "dur", "ev")
    val r = Survival.kaplanMeier(d, Seq("g"), "dur", "ev").collect().head
    assert(r.getAs[Long]("events") == 2L && r.getAs[Long]("at_risk") == 2L)
    assert(r.isNullAt(r.fieldIndex("km_log_micro")))
  }

  test("logRank: hand-computed O/E/V against the double reference") {
    // arm A: events at t=1,2; censored at 3. arm B: events at 3,4,
    // censored at 4.
    val subjects = Seq(
      (true, 1L, true), (true, 2L, true), (true, 3L, false),
      (false, 3L, true), (false, 4L, true), (false, 4L, false))
      .map { case (a, t, e) => ("g", a, t, e) }
    val r = Survival.logRank(subjects.toDF("grp", "arm", "dur", "ev"),
      Seq("grp"), "arm", "dur", "ev").collect().head
    // event times: 1 (r=6, rA=3, d=1, dA=1), 2 (r=5, rA=2, d=1, dA=1),
    // 3 (r=4, rA=1, d=1, dA=0), 4 (r=2, rA=0, d=1, dA=0)
    val times = Seq((6L, 3L, 1L), (5L, 2L, 1L), (4L, 1L, 1L), (2L, 0L, 1L))
    val o = 2L
    val eMicro = times.map { case (rr, ra, d) => d * ra * 1000000L / rr }.sum
    val vMicro = times.map { case (rr, ra, d) =>
      if (rr > 1) d * ra * (rr - ra) * (rr - d) * 1000000L /
        (rr * rr * (rr - 1)) else 0L
    }.sum
    assert(r.getAs[Long]("n_times") == 4L)
    assert(r.getAs[Long]("o_a") == o)
    assert(r.getAs[Long]("e_a_micro") == eMicro)
    assert(r.getAs[Long]("v_micro") == vMicro)
    val z = math.floor((o * 1000000L - eMicro).toDouble * 1000.0 /
      math.sqrt(vMicro.toDouble)).toLong
    assert(r.getAs[Long]("z_micro") == z)
  }

  test("logRank: a single-arm group has zero variance and NULL z/p") {
    val df = Seq(("g", true, 1L, true), ("g", true, 2L, true))
      .toDF("grp", "arm", "dur", "ev")
    val r = Survival.logRank(df, Seq("grp"), "arm", "dur", "ev")
      .collect().head
    // rA = r at every time -> every E term = d*1e6, V terms = 0
    assert(r.getAs[Long]("v_micro") == 0L)
    assert(r.isNullAt(r.fieldIndex("z_micro")))
    assert(r.isNullAt(r.fieldIndex("p_micro")))
  }
}
