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
}
