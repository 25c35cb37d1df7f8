package graft.ops

import graft.Cols

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J1 — positional image↔row join (reference: handlers/base.py:229-272):
  * images extracted from a spreadsheet carry an (excel_row, excel_col)
  * anchor; the image lands on table row `excel_row - rowOffset - 1`;
  * multiple images on one cell are space-joined; anchors outside the table
  * are dropped; rows without an image get "".
  *
  * Spark-first shape: pre-aggregate the image side per target row, then a
  * broadcast left equi-join against the table's explicit `_idx` — the image
  * side is tiny relative to the table, so no shuffle of the big side.
  */
object JoinOps {

  def attachImages(
      df: DataFrame,
      images: DataFrame,          // (rowCol, orderCol, payloadCol)
      rowCol: String,
      payloadCol: String,
      imageOrderCol: String,
      rowOffset: Int,
      outputCol: String = "Изображение"): DataFrame = {

    val perRow = images
      .withColumn("_target", Cols.q(rowCol).cast("long") - rowOffset - 1)
      .groupBy(col("_target"))
      .agg(
        // deterministic multi-image order via (order, payload) struct sort
        array_join(
          transform(
            array_sort(collect_list(struct(Cols.q(imageOrderCol).as("o"),
              Cols.q(payloadCol).as("v")))),
            s => s.getField("v")),
          " ").as(outputCol))

    // The reference OVERWRITES the sheet's existing image column with the
    // extracted payloads (handlers/base.py:270-272 `with_columns` on the
    // same name); a sheet-sourced column of that name is dropped first so
    // the join never produces an ambiguous duplicate.
    val base = if (df.columns.contains(outputCol)) df.drop(outputCol) else df
    base.join(broadcast(perRow), col(ShapeOps.IndexCol) === col("_target"), "left")
      .drop("_target")
      .withColumn(outputCol, coalesce(Cols.q(outputCol), lit("")))
  }

  /** The reference's anchor-snap heuristic (handlers/base.py:233-239):
    * `excel_row = anchor_row + 1 + (1 if rowOff > 10000 else 0)` —
    * preserved as-is for parity.
    */
  def anchorToExcelRow(anchorRow: Column, rowOffEmu: Column): Column =
    anchorRow + lit(1) + when(rowOffEmu > 10000, lit(1)).otherwise(lit(0))
}
