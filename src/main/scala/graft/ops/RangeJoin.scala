package graft.ops

import graft.Cols

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bin bucketing — the other join shape
  * Spark lacks natively (it plans `p BETWEEN lo AND hi` as a broadcast
  * nested loop or cartesian product).
  *
  * Both sides are keyed by a bin of width `binWidth`: points land in one
  * bin, intervals explode across every bin they overlap; candidates come
  * from an equi-join on the bin and are verified with the exact bound
  * predicate. A (point, interval) pair can only meet in the point's bin,
  * so no dedup is needed. Output is exactly the inequality join's.
  *
  * Scale: shuffle volume is |points| + Σ interval_spans/binWidth — linear
  * for bounded-span intervals; binWidth tunes the fan-out vs selectivity
  * trade (≈ median interval width is the usual choice). Equi-join on the
  * bin key means AQE/skew handling applies as usual.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0)
    val p = points.withColumn("_bin",
      floor(Cols.q(pointCol) / binWidth).cast("long"))
    val iv = intervals
      .withColumn("_bin", explode(sequence(
        floor(Cols.q(loCol) / binWidth).cast("long"),
        floor(Cols.q(hiCol) / binWidth).cast("long"))))
    p.join(iv,
        p("_bin") === iv("_bin") &&
          Cols.q(pointCol) >= Cols.q(loCol) && Cols.q(pointCol) <= Cols.q(hiCol))
      .drop("_bin")
  }
}
