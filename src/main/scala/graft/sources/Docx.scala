package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable
import scala.xml.{Elem, Node, XML}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Native DOCX table parsing — S7 (multi-table concat) at byte-level parity
  * with the reference (handlers/kyrgyzstan.py:239-251 python-docx walk):
  * a DOCX file is a zip containing `word/document.xml`, so `java.util.zip`
  * + `scala.xml` cover it without a docx library.
  *
  * Cell semantics mirror python-docx's `row.cells` exactly, because the
  * reference iterates that accessor:
  *  - a `gridSpan` cell is repeated once per spanned grid column;
  *  - a `vMerge` continuation cell repeats the text of the cell above;
  *  - cell text = paragraphs joined with "\n"; inside a paragraph,
  *    `w:t` text concatenates with `w:tab` → "\t" and `w:br`/`w:cr` → "\n";
  *  - only top-level body tables are walked (nested tables belong to their
  *    cell, as in python-docx `document.tables`).
  *
  * Scale shape: one registry DOCX is a driver-side artifact (the reference
  * converts a single fetched PDF); the corpus form is [[readFiles]]
  * (binaryFile source, one task per document).
  */
object Docx {

  private def documentXml(bytes: Array[Byte]): Elem = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var e = zin.getNextEntry
    var doc: Option[Elem] = None
    while (e != null && doc.isEmpty) {
      if (e.getName == "word/document.xml")
        doc = Some(XML.load(new ByteArrayInputStream(zin.readAllBytes())))
      zin.closeEntry()
      e = zin.getNextEntry
    }
    doc.getOrElse(throw new IllegalArgumentException("not a DOCX: no word/document.xml"))
  }

  private def attr(n: Node, key: String): Option[String] =
    n.attributes.collectFirst { case a if a.key == key => a.value.text }

  /** python-docx `cell.text`: direct paragraphs joined by "\n"; runs keep
    * document order with tab/br/cr expansion.
    */
  private[sources] def cellText(tc: Node): String =
    (tc \ "p").map { p =>
      p.descendant.collect {
        case t if t.label == "t" => t.text
        case t if t.label == "tab" => "\t"
        case t if t.label == "br" || t.label == "cr" => "\n"
      }.mkString
    }.mkString("\n")

  /** Tables → rows → grid-column cells (gridSpan repeated, vMerge filled
    * down), raw text — the python-docx `table.rows[i].cells[j].text` view.
    */
  def parseTables(bytes: Array[Byte]): Vector[Vector[Vector[String]]] = {
    val body = documentXml(bytes) \ "body"
    (body \ "tbl").map { tbl =>
      // per-grid-column text of the previous row, for vMerge continuation
      val above = mutable.Map[Int, String]()
      (tbl \ "tr").map { tr =>
        val cells = mutable.ArrayBuffer[String]()
        var gridCol = 0
        (tr \ "tc").foreach { tc =>
          val pr = (tc \ "tcPr").headOption
          val span = pr.toSeq.flatMap(_ \ "gridSpan")
            .headOption.flatMap(attr(_, "val")).map(_.toInt).getOrElse(1)
          val vMergeCont = pr.toSeq.flatMap(_ \ "vMerge").headOption.exists { vm =>
            !attr(vm, "val").contains("restart")
          }
          val text =
            if (vMergeCont) above.getOrElse(gridCol, "")
            else cellText(tc)
          (0 until span).foreach { _ =>
            above(gridCol) = text
            cells += text
            gridCol += 1
          }
        }
        cells.toVector
      }.toVector
    }.toVector
  }

  /** The reference's concat semantics (handlers/kyrgyzstan.py:239-251):
    * every table's rows appended into one grid, each cell stripped, rows
    * padded to the GLOBAL max width with "" — ready for the same
    * promoteHeader / sliceFrom / clean pipeline the XLSX path uses
    * (columns `column_1..N` + `_idx`).
    */
  def readTables(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val all = parseTables(bytes).flatten.map(_.map(_.strip))
    require(all.nonEmpty, "no tables found in DOCX")
    val width = all.map(_.size).max
    val padded = all.map(r => r.padTo(width, ""))
    val schema = StructType(
      StructField(graft.ops.ShapeOps.IndexCol, LongType, nullable = false) +:
      (1 to width).map(i => StructField(s"column_$i", StringType, nullable = true)))
    val rows = padded.zipWithIndex.map { case (r, i) => Row.fromSeq(i.toLong +: r) }
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }

  /** Corpus-scale form: one task per document via the `binaryFile` source;
    * each file's concatenated-table grid lands as (`file`, `_idx`, `cells`)
    * with per-file padding (widths differ across documents).
    */
  def readFiles(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val all = parseTables(bytes).flatten.map(_.map(_.strip))
        val width = all.map(_.size).maxOption.getOrElse(0)
        all.zipWithIndex.map { case (r, i) =>
          (path, i.toLong, r.padTo(width, ""))
        }
      }
      .toDF("file", graft.ops.ShapeOps.IndexCol, "cells")
  }
}
