package graft.ops

import graft.Cols

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the right row with the
  * greatest timestamp ≤ the left timestamp, per key. Spark has no native
  * as-of join; per the project's operator-preference order this composes
  * existing ops (tagged union + last-ignoring-nulls over an ordered
  * window) rather than a custom physical operator:
  *
  *  - no range/theta join anywhere — the naive `r.ts <= l.ts` inequality
  *    join is O(|L|·|R|) per key and collapses under skew;
  *  - one shuffle of L∪R by key, then a linear window scan per key —
  *    the same shape DuckDB/kdb execute natively;
  *  - right rows sort before left rows at equal timestamps, giving the
  *    standard inclusive (≤) as-of semantics.
  *
  * At scale the window partitions by the join key, so parallelism follows
  * key cardinality; a monotone time dimension per key is the only
  * ordering requirement.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry to matched left rows
    *                   (must not collide with left column names)
    *
    * The matched right row travels as ONE struct column (`_rv`), and a
    * single `last(_rv, ignoreNulls = true)` picks it — so all value
    * columns come atomically from the same right row even when some of
    * its fields are null (per-column `last(ignoreNulls)` would stitch
    * non-null values from different rows). Ties among right rows at the
    * same (key, ts) break on a separate `_tb` sort key built from the
    * ORDERABLE value columns only (a struct can carry MapType and friends
    * but can't sort by them); when no value column is orderable, `_tb`
    * falls back to a stable content hash of the row (`xxhash64(to_json)`),
    * so the winner is deterministic regardless of partitioning or arrival
    * order and non-orderable payloads still pass analysis.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns.toIndexedSeq
    require(valueCols.forall(!leftCols.contains(_)),
      s"right value columns collide with left: ${valueCols.intersect(leftCols)}")

    val rvType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)).toArray)

    // Tiebreak key: only the orderable value columns may enter a sort key
    // (MapType etc. fail analysis); with none orderable, a content hash of
    // the row keeps the winner deterministic.
    val orderableCols = valueCols.filter(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType))
    val rightTb: org.apache.spark.sql.Column =
      if (orderableCols.nonEmpty) struct(orderableCols.map(c => Cols.q(c).as(c)): _*)
      else xxhash64(to_json(struct(valueCols.map(c => Cols.q(c).as(c)): _*)))

    val leftTagged0 = left
      .withColumn("_k", Cols.q(leftKey))
      .withColumn("_t", Cols.q(leftTs))
      .withColumn("_side", lit(1))
      .select((Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(Cols.q) :+
        lit(null).cast(rvType).as("_rv")): _*)

    val rightTagged = right
      .withColumn("_k", Cols.q(rightKey))
      .withColumn("_t", Cols.q(rightTs))
      .withColumn("_side", lit(0))
      .select((Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(c => Cols.q(c).as(c)): _*).as("_rv") :+
        rightTb.as("_tb")): _*)

    val leftTagged = leftTagged0
      .withColumn("_tb", lit(null).cast(rightTagged.schema("_tb").dataType))

    // Right (side=0) sorts before left (side=1) at equal t → inclusive ≤;
    // _tb breaks ties among right rows at the same (key, t).
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftTagged.unionByName(rightTagged)
      .withColumn("_rv", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((leftCols.map(Cols.q) ++
        valueCols.map(c => col("_rv").getField(c).as(c))): _*)
  }
}
