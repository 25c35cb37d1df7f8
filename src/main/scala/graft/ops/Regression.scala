package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass grouped ordinary-least-squares trend fitting — the "is this
  * metric drifting?" primitive (corpus quality over crawl date, revenue
  * over time per segment). Closed-form slope/intercept from the five
  * classic power sums, so the whole fit is ONE hash aggregation with
  * map-side partials — no iteration, no per-group value buffering (the
  * shape exact percentiles cannot achieve).
  */
object Regression {

  /** Per-group OLS fit of `yCol` against `xCol`. Returns one row per
    * group: `(groupCols*, n, slope_micro, intercept_micro, mean_y_micro)`
    * where slope/intercept/mean are reported in integer 10⁻⁶ y-units
    * (slope per one x-unit). Rows with a NULL x or y are ignored; groups
    * whose x has zero variance (n = 1, or all x equal) report NULL
    * slope/intercept (the fit is undefined) with the mean still defined.
    *
    * Deterministic cross-engine by exact arithmetic end-to-end: x must be
    * integer-valued (cast to long; the caller projects e.g. a datediff),
    * y is quantized to 10⁻⁴ units, power sums accumulate in decimal(38,0)
    * (exact like DuckDB's HUGEINT — float sums are order-dependent,
    * decimal sums are not), and each reported value is one integral
    * division (`div`), which truncates toward zero in BOTH engines
    * (-7 div 2 = -3; DuckDB's `//` agrees — tested, and the negative-slope
    * spec pins it).
    *
    * Scale: a pure partial-aggregable groupBy — the five sums combine
    * associatively, so 100 TB costs one shuffle of |groups| rows. The
    * decimal(38,0) headroom holds to ~10¹² rows per group at price-scale
    * magnitudes (n·sxy ≲ 10³⁸); quantize coarser if x·y exceeds that.
    */
  def linearTrend(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "linearTrend needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(g ++ Seq(
        col(xCol).cast("long").cast(dec).as("_rg_x"),
        round(col(yCol) * 10000).cast("long").cast(dec).as("_rg_y")): _*)
    rows.groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("_rg_x")).as("_rg_sx"),
        sum(col("_rg_y")).as("_rg_sy"),
        sum(col("_rg_x") * col("_rg_x")).as("_rg_sxx"),
        sum(col("_rg_x") * col("_rg_y")).as("_rg_sxy"))
      .withColumn("_rg_num",
        col("n").cast(dec) * col("_rg_sxy") - col("_rg_sx") * col("_rg_sy"))
      .withColumn("_rg_den",
        col("n").cast(dec) * col("_rg_sxx") - col("_rg_sx") * col("_rg_sx"))
      .select((g ++ Seq(col("n"),
        when(col("_rg_den") > 0, expr("(_rg_num * 100) div _rg_den"))
          .as("slope_micro"),
        when(col("_rg_den") > 0,
          expr("((_rg_sy * _rg_den - _rg_num * _rg_sx) * 100) div (n * _rg_den)"))
          .as("intercept_micro"),
        expr("(_rg_sy * 100) div n").as("mean_y_micro"))): _*)
  }
}
