package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** J1 positional image↔row join (handlers/base.py:229-272). */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("attachImages: offset mapping, multi-image order, out-of-range drop, empty default") {
    val table = ShapeOps.withIndex(
      Seq((0L, "r0"), (1L, "r1"), (2L, "r2")).toDF("ord", "v"), col("ord"))
    // ROW_OFFSET=2 → excel_row maps to _idx = excel_row - 3
    val images = Seq(
      (3L, 1, "imgA"),   // → _idx 0
      (4L, 2, "imgC"),   // → _idx 1 (second by order)
      (4L, 1, "imgB"),   // → _idx 1 (first by order)
      (99L, 1, "imgZ"))  // out of range → dropped
      .toDF("excel_row", "ord_img", "b64")

    val r = JoinOps.attachImages(table, images, rowCol = "excel_row",
        payloadCol = "b64", imageOrderCol = "ord_img", rowOffset = 2)
      .orderBy("_idx").select("Изображение").as[String].collect()

    assert(r.toSeq == Seq("imgA", "imgB imgC", ""))
  }

  test("fuzz: attachImages matches a local fold on random anchors (ties, dups, out-of-range)") {
    val rnd = new scala.util.Random(207)
    for (trial <- 1 to 3) {
      val nRows = 10 + rnd.nextInt(20)
      val rowOffset = rnd.nextInt(4)
      val tableRows = (0 until nRows).map(i => (i.toLong, s"v$i"))
      // anchors spanning in-range, below-range (negative targets), and
      // above-range; duplicate (row, order) keys exercise the struct
      // tie-break on payload
      val images = (1 to 30 + rnd.nextInt(30)).map { _ =>
        (rnd.nextInt(nRows + 12).toLong - 4, rnd.nextInt(3), s"p${rnd.nextInt(8)}")
      }
      val got = JoinOps.attachImages(
          ShapeOps.withIndex(tableRows.toDF("ord", "v"), col("ord")),
          images.toDF("excel_row", "ord_img", "b64"),
          rowCol = "excel_row", payloadCol = "b64",
          imageOrderCol = "ord_img", rowOffset = rowOffset)
        .orderBy("_idx").select("Изображение").as[String].collect().toSeq
      val byTarget = images.groupBy(i => i._1 - rowOffset - 1)
      val want = (0 until nRows).map { idx =>
        byTarget.get(idx.toLong)
          .map(_.map(i => (i._2, i._3)).sorted.map(_._2).mkString(" "))
          .getOrElse("")
      }
      assert(got == want, s"trial $trial (offset $rowOffset): $got vs $want")
    }
  }

  test("anchorToExcelRow applies the reference's rowOff snap heuristic (base.py:233-239)") {
    val df = Seq((5L, 5000L), (5L, 20000L)).toDF("anchor", "off")
    val r = df.select(JoinOps.anchorToExcelRow(col("anchor"), col("off")).as("er"))
      .as[Long].collect()
    assert(r.toSeq == Seq(6L, 7L))
  }

  test("attachImages keeps the image side broadcast (no shuffle of the big side)") {
    val table = ShapeOps.withIndex(
      spark.range(1000).toDF("ord"), col("ord"))
    val images = Seq((3L, 1, "img")).toDF("excel_row", "ord_img", "b64")
    val plan = JoinOps.attachImages(table, images, "excel_row", "b64", "ord_img", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in plan:\n$plan")
  }
}
