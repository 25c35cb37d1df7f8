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

    val leftTagged = left
      .withColumn("_k", Cols.q(leftKey))
      .withColumn("_t", Cols.q(leftTs))
      .withColumn("_side", lit(1))
      .select((Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(Cols.q) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)

    val rightTagged = right
      .withColumn("_k", Cols.q(rightKey))
      .withColumn("_t", Cols.q(rightTs))
      .withColumn("_side", lit(0))
      .select((Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(Cols.q)): _*)

    // Right (side=0) sorts before left (side=1) at equal t → inclusive ≤.
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = valueCols.foldLeft(leftTagged.unionByName(rightTagged)) {
      case (df, c) => df.withColumn(c, last(Cols.q(c), ignoreNulls = true).over(w))
    }

    matched.filter(col("_side") === 1)
      .select((leftCols ++ valueCols).map(Cols.q): _*)
  }
}
