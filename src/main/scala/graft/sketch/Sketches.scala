package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation — the cardinality pattern that replaces
  * exact count-distinct at 100 TB: a DataSketches HLL sketch per group is
  * a few KB regardless of group size, partial-aggregates map-side, and
  * sketches for fine-grained groups UNION into coarser rollups without
  * rescanning the base data (count-distinct famously does not compose:
  * you cannot add distinct counts across partitions).
  *
  * Built entirely on Spark 3.5+/4.x built-ins (`hll_sketch_agg`,
  * `hll_union_agg`, `hll_sketch_estimate`) — codegen'd aggregates, no UDAF.
  * NOTE estimates are NOT bit-stable across partitionings: a fresh sketch
  * estimates with the HIP estimator, merged sketches fall back to the
  * composite estimator, so the partial-merge tree shifts the estimate
  * within the error bounds (measured empirically in SketchesSpec, which
  * pins the bounds rather than exact values). No SQL oracle for the same
  * reason — the driver records the rows-only check.
  */
object Sketches {

  /** Approximate distinct values of `valueCol` per group. `lgK` trades
    * size for accuracy (12 → ~1.6% rse, 4 KB per sketch).
    */
  def approxDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col(valueCol), lit(lgK))).as("approx_distinct"))

  /** Two-level sketch rollup: per-(group, subgroup) sketches, then the
    * per-group totals by MERGING the subgroup sketches — the reusable
    *-aggregate shape (daily sketches → monthly totals) that makes
    * sketches the right answer at scale. Returns (group, subgroup level
    * with estimate, is_total=false) unioned with (group, NULL, merged
    * estimate, is_total=true). The explicit `is_total` marker — not the
    * NULL subgroup — identifies rollup rows: input data whose subgroup
    * VALUE is null would otherwise be indistinguishable from the total
    * (the same reason SQL has grouping_id()).
    */
  def rollupDistinct(
      df: DataFrame, groupCol: String, subCol: String, valueCol: String,
      lgK: Int = 12): DataFrame = {
    val subType = df.schema(subCol).dataType
    val fine = df.groupBy(col(groupCol), col(subCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sk"))
    val coarse = fine.groupBy(col(groupCol))
      .agg(hll_union_agg(col("sk")).as("sk"))
      // Null at the subgroup's NATIVE type, so callers keep typed joins.
      .select(col(groupCol), lit(null).cast(subType).as(subCol),
        hll_sketch_estimate(col("sk")).as("approx_distinct"),
        lit(true).as("is_total"))
    fine.select(col(groupCol), col(subCol),
        hll_sketch_estimate(col("sk")).as("approx_distinct"),
        lit(false).as("is_total"))
      .unionByName(coarse)
  }
}
