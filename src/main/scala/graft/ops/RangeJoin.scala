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

  /** Interval-overlap join (CLOSED intervals, touching endpoints
    * overlap): every (left, right) pair with `lo_l ≤ hi_r ∧ lo_r ≤
    * hi_l`, optionally restricted to equal `keyL(i) = keyR(i)` columns
    * — the per-entity form that keeps candidate volume sane (validity
    * windows per entity, session co-occurrence per user, shipment
    * window collisions per part).
    *
    * Bin-bucketed like [[pointInInterval]], both sides exploding to
    * their covered bins; a pair is emitted ONLY in the bin of
    * `max(lo_l, lo_r)` — the first bin both intervals cover, which
    * exists iff they overlap — so each pair appears exactly once with
    * NO distinct. Column names must not collide across sides (alias
    * first); `lo ≤ hi` is the caller's contract.
    *
    * Scale: shuffle is Σ span/binWidth rows per side, equi-joined on
    * (key…, bin) — hash-partitionable, AQE skew-split applies. binWidth
    * ≈ median interval width balances explode fan-out against per-bin
    * candidate density, exactly as in the point form.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      loL: String, hiL: String,
      loR: String, hiR: String,
      binWidth: Double,
      keyL: Seq[String] = Nil,
      keyR: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0)
    require(keyL.length == keyR.length, "key column lists must pair up")
    val l = left.withColumn("_binl", explode(sequence(
      floor(Cols.q(loL) / binWidth).cast("long"),
      floor(Cols.q(hiL) / binWidth).cast("long"))))
    val r = right.withColumn("_binr", explode(sequence(
      floor(Cols.q(loR) / binWidth).cast("long"),
      floor(Cols.q(hiR) / binWidth).cast("long"))))
    val keyEq = keyL.zip(keyR)
      .map { case (a, b) => l(a) === r(b) }
      .foldLeft(lit(true))(_ && _)
    l.join(r,
        l("_binl") === r("_binr") && keyEq &&
          Cols.q(loL) <= Cols.q(hiR) && Cols.q(loR) <= Cols.q(hiL) &&
          l("_binl") ===
            floor(greatest(Cols.q(loL), Cols.q(loR)) / binWidth).cast("long"))
      .drop("_binl").drop("_binr")
  }
}
