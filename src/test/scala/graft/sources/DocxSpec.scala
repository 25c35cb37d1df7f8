package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.ops.{MergeOps, ShapeOps, TextOps}

/** S7 byte-level parity: hand-built DOCX zip fixtures parsed by the native
  * reader, driven through the full Kyrgyzstan pipeline shape (P1/P5 header
  * dedup → P2 slice → T3 clean_cell → T4 regnum normalize → A1
  * continuation merge) and differentially asserted against the identical
  * ops over a natively built frame.
  */
class DocxSpec extends SparkSpec {

  private val w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  private def docx(documentXml: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    zos.write(documentXml.getBytes(UTF_8))
    zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  private def tc(text: String): String =
    s"<w:tc><w:p><w:r><w:t xml:space=\"preserve\">$text</w:t></w:r></w:p></w:tc>"
  private def tr(cells: String*): String =
    s"<w:tr>${cells.mkString}</w:tr>"

  /** Registry fixture: two tables of different widths (the multi-table
    * ragged concat), dup/empty header names, a "Name:" artifact row, a
    * messy reg number, and continuation rows spilling across the table
    * boundary.
    */
  private def registryFixture: Array[Byte] = {
    val t1 = "<w:tbl>" +
      tr(tc("Рег. №"), tc("Наименование"), tc(""), tc("Наименование")) +
      tr(tc("skip"), tc("skip"), tc("skip"), tc("skip")) +
      tr("<w:tc><w:p><w:r><w:t xml:space=\"preserve\">№0001/ТЗ</w:t></w:r></w:p></w:tc>",
        // multi-run cell with a tab: "Widget\tA" → clean_cell → "Widget A"
        "<w:tc><w:p><w:r><w:t>Widget</w:t><w:tab/><w:t>A</w:t></w:r></w:p></w:tc>",
        tc("x"), tc("y")) +
      tr(tc(""), tc("continuation"), tc(""), tc("z")) +
      tr(tc("Name: footer"), tc("drop"), tc(""), tc("")) +
      tr(tc("№ 0002 / ТЗ"), tc("Gadget"), tc(""), tc("")) +
      "</w:tbl>"
    val t2 = "<w:tbl>" + tr(tc("cont2"), tc("wide")) + "</w:tbl>"
    docx(s"""<w:document xmlns:w="$w"><w:body>$t1$t2</w:body></w:document>""")
  }

  test("parseTables: gridSpan repetition, vMerge fill-down, paragraphs/tabs/breaks") {
    val fixture = docx(s"""<w:document xmlns:w="$w"><w:body><w:tbl>
      |<w:tr><w:tc><w:tcPr><w:gridSpan w:val="2"/></w:tcPr>
      |  <w:p><w:r><w:t>M</w:t></w:r></w:p></w:tc>${tc("B")}</w:tr>
      |<w:tr><w:tc><w:tcPr><w:vMerge w:val="restart"/></w:tcPr>
      |  <w:p><w:r><w:t>V</w:t></w:r></w:p></w:tc>${tc("c1")}${tc("c2")}</w:tr>
      |<w:tr><w:tc><w:tcPr><w:vMerge/></w:tcPr><w:p/></w:tc>${tc("d1")}${tc("d2")}</w:tr>
      |<w:tr><w:tc><w:p><w:r><w:t>p1</w:t></w:r></w:p><w:p><w:r><w:t>p2</w:t></w:r></w:p></w:tc>
      |  <w:tc><w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p></w:tc>
      |  ${tc("")}</w:tr>
      |</w:tbl></w:body></w:document>""".stripMargin)
    val tables = Docx.parseTables(fixture)
    assert(tables.size == 1)
    assert(tables(0) == Vector(
      Vector("M", "M", "B"),
      Vector("V", "c1", "c2"),
      Vector("V", "d1", "d2"),      // vMerge continuation repeats the cell above
      Vector("p1\np2", "a\tb\nc", "")))
  }

  test("parseTables: nested tables stay out of both the table walk and cell text") {
    // python-docx document.tables returns top-level tables only, and
    // cell.text excludes any nested table's paragraphs — both pinned here
    val fixture = docx(s"""<w:document xmlns:w="$w"><w:body><w:tbl>
      |<w:tr><w:tc><w:p><w:r><w:t>outer</w:t></w:r></w:p>
      |  <w:tbl><w:tr><w:tc><w:p><w:r><w:t>inner</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
      |</w:tc>${tc("b")}</w:tr>
      |</w:tbl></w:body></w:document>""".stripMargin)
    val tables = Docx.parseTables(fixture)
    assert(tables == Vector(Vector(Vector("outer", "b"))))
  }

  test("readTables: multi-table concat pads ragged rows to the global width") {
    val grid = Docx.readTables(spark, registryFixture)
      .orderBy(col(ShapeOps.IndexCol)).collect().toSeq
    assert(grid.size == 7 && grid.forall(_.length == 5)) // _idx + 4 columns
    assert(grid(2) == Row(2L, "№0001/ТЗ", "Widget\tA", "x", "y"))
    assert(grid(6) == Row(6L, "cont2", "wide", "", "")) // 2-col table padded
  }

  test("end-to-end S7: DOCX bytes → header dedup → slice → clean → regnum → merge == native path") {
    def pipeline(grid: org.apache.spark.sql.DataFrame) = {
      val shaped = ShapeOps.sliceFrom(ShapeOps.promoteHeader(grid), 2)
      val cleaned = shaped.select(
        col(ShapeOps.IndexCol) +:
        shaped.columns.filter(_ != ShapeOps.IndexCol).toIndexedSeq.map(c =>
          TextOps.cleanCell(graft.Cols.q(c)).as(c)): _*)
      val normalized = cleaned.withColumn("Рег. №",
        TextOps.normalizeRegNum(graft.Cols.q("Рег. №")))
      MergeOps.continuationMerge(normalized, keyCol = "Рег. №")
        .orderBy(col("record_id"))
        .select(graft.Cols.q("Рег. №"), col("Наименование"),
          col("Unnamed_1"), col("Наименование_1"))
    }

    val actual = pipeline(Docx.readTables(spark, registryFixture)).collect().toSeq

    // identical logical grid, natively built (the Parquet path)
    val schema = StructType(StructField(ShapeOps.IndexCol, LongType) +:
      (1 to 4).map(i => StructField(s"column_$i", StringType)))
    val nativeRows = Seq(
      Row(0L, "Рег. №", "Наименование", "", "Наименование"),
      Row(1L, "skip", "skip", "skip", "skip"),
      Row(2L, "№0001/ТЗ", "Widget\tA", "x", "y"),
      Row(3L, "", "continuation", "", "z"),
      Row(4L, "Name: footer", "drop", "", ""),
      Row(5L, "№ 0002 / ТЗ", "Gadget", "", ""),
      Row(6L, "cont2", "wide", "", ""))
    val native = spark.createDataFrame(
      spark.sparkContext.parallelize(nativeRows), schema)
    val expected = pipeline(native).collect().toSeq

    assert(actual == expected)
    // and the semantics, pinned: record 1 folds its continuation row
    // (empty cells skipped), the "Name:" row vanishes, record 2 absorbs
    // the second table's row and its reg number is normalized.
    assert(actual == Seq(
      Row("0001/ТЗ", "Widget A continuation", "x", "y z"),
      Row("0002/ТЗ cont2", "Gadget wide", "", "")))
  }

  test("readFiles: distributed per-file parse") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docx-corpus")
    java.nio.file.Files.write(dir.resolve("a.docx"), registryFixture)
    java.nio.file.Files.write(dir.resolve("b.docx"), registryFixture)
    val df = Docx.readFiles(spark, dir.toString + "/*.docx")
    assert(df.count() == 14) // 7 grid rows × 2 files
    val keys = df.filter(col(ShapeOps.IndexCol) === 2)
      .select(col("cells").getItem(0)).as[String].collect().toSeq
    assert(keys == Seq("№0001/ТЗ", "№0001/ТЗ"))
  }
}
