package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.{JoinOps, ShapeOps}

/** S4/S5 byte-level parity: a hand-built XLSX zip fixture (sharedStrings +
  * sheet + drawing + media parts) read by the native zip+XML parser, then
  * driven through the SAME promoteHeader/sliceFrom/attachImages pipeline
  * as the Parquet path, and differentially asserted against a natively
  * constructed frame of the same logical table.
  */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private val nsMain = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val nsRel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val nsPkgRel = "http://schemas.openxmlformats.org/package/2006/relationships"
  private val nsXdr = "http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing"
  private val nsA = "http://schemas.openxmlformats.org/drawingml/2006/main"

  private def zip(parts: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    parts.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private val pngA = Array[Byte](0x50, 0x4e, 0x47, 0x41) // fake payloads
  private val pngB = Array[Byte](0x50, 0x4e, 0x47, 0x42)
  private val pngC = Array[Byte](0x50, 0x4e, 0x47, 0x43)

  /** Fixture sheet (1-based rows):
    *  1  title junk              (dropped by skipRows=1)
    *  2  header row with a shared-string, an empty and a duplicate name
    *  3  junk                    (dropped by sliceFrom)
    *  4  junk                    (dropped by sliceFrom)
    *  5  data: shared str / inline str / numeric / bool / sparse-missing
    *  6  data: sparse cells (B skipped entirely)
    *  7  data
    * Images: A+C on sheet row 5 (same cell, rowOff<=10000), B snapped to
    * row 7 by the rowOff>10000 heuristic, D anchored out of range.
    */
  private def fixture: Array[Byte] = {
    val shared = Seq("Рег. №", "№0001/ТЗ", "№0002/ТЗ")
    val sharedXml =
      s"""<sst xmlns="$nsMain" count="${shared.size}" uniqueCount="${shared.size}">""" +
        shared.map(s => s"<si><t>$s</t></si>").mkString + "</sst>"
    val sheetXml =
      s"""<worksheet xmlns="$nsMain" xmlns:r="$nsRel"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>Реестр товарных знаков</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2" t="inlineStr"><is><t>Бренд</t></is></c><c r="C2"/><c r="D2" t="inlineStr"><is><t>Бренд</t></is></c><c r="E2" t="inlineStr"><is><t>Изображение</t></is></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>x</t></is></c></row>
        |<row r="4"><c r="A4" t="inlineStr"><is><t>y</t></is></c></row>
        |<row r="5"><c r="A5" t="s"><v>1</v></c><c r="B5" t="inlineStr"><is><t>Acme</t></is></c><c r="C5"><v>42</v></c><c r="D5" t="b"><v>1</v></c></row>
        |<row r="6"><c r="A6" t="s"><v>2</v></c><c r="C6" t="str"><v>3.5</v></c><c r="D6" t="b"><v>0</v></c><c r="E6" t="inlineStr"><is><t>prev</t></is></c></row>
        |<row r="7"><c r="A7" t="inlineStr"><is><t>№0003/ТЗ</t></is></c><c r="B7" t="inlineStr"><is><t>Zenith</t></is></c></row>
        |</sheetData><drawing r:id="rId2"/></worksheet>""".stripMargin
    val workbookXml =
      s"""<workbook xmlns="$nsMain" xmlns:r="$nsRel"><sheets>
        |<sheet name="Реестр" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val workbookRels =
      s"""<Relationships xmlns="$nsPkgRel">
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val sheetRels =
      s"""<Relationships xmlns="$nsPkgRel">
        |<Relationship Id="rId2" Type="t" Target="../drawings/drawing1.xml"/>
        |</Relationships>""".stripMargin
    def anchor(row: Int, col: Int, rowOff: Long, rid: String) =
      s"""<xdr:twoCellAnchor><xdr:from><xdr:col>$col</xdr:col><xdr:colOff>0</xdr:colOff>
        |<xdr:row>$row</xdr:row><xdr:rowOff>$rowOff</xdr:rowOff></xdr:from>
        |<xdr:to><xdr:col>${col + 1}</xdr:col><xdr:colOff>0</xdr:colOff>
        |<xdr:row>${row + 1}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:to>
        |<xdr:pic><xdr:blipFill><a:blip r:embed="$rid"/></xdr:blipFill></xdr:pic>
        |<xdr:clientData/></xdr:twoCellAnchor>""".stripMargin
    val drawingXml =
      s"""<xdr:wsDr xmlns:xdr="$nsXdr" xmlns:a="$nsA" xmlns:r="$nsRel">""" +
        anchor(4, 4, 0, "rId1") +        // A: sheet row 5
        anchor(5, 4, 20000, "rId2") +    // B: rowOff>10000 → snapped to row 7
        anchor(4, 4, 9999, "rId3") +     // C: same cell as A, no snap
        anchor(20, 4, 0, "rId1") +       // D: out of table range → dropped
        "</xdr:wsDr>"
    val drawingRels =
      s"""<Relationships xmlns="$nsPkgRel">
        |<Relationship Id="rId1" Type="t" Target="../media/image1.png"/>
        |<Relationship Id="rId2" Type="t" Target="../media/image2.png"/>
        |<Relationship Id="rId3" Type="t" Target="../media/image3.png"/>
        |</Relationships>""".stripMargin
    zip(Seq(
      "xl/workbook.xml" -> workbookXml.getBytes(UTF_8),
      "xl/_rels/workbook.xml.rels" -> workbookRels.getBytes(UTF_8),
      "xl/sharedStrings.xml" -> sharedXml.getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" -> sheetXml.getBytes(UTF_8),
      "xl/worksheets/_rels/sheet1.xml.rels" -> sheetRels.getBytes(UTF_8),
      "xl/drawings/drawing1.xml" -> drawingXml.getBytes(UTF_8),
      "xl/drawings/_rels/drawing1.xml.rels" -> drawingRels.getBytes(UTF_8),
      "xl/media/image1.png" -> pngA,
      "xl/media/image2.png" -> pngB,
      "xl/media/image3.png" -> pngC))
  }

  test("colIndex: A/B/Z/AA/AB/BA addresses decode to 0-based columns") {
    assert(Seq("A1", "B7", "Z2", "AA10", "AB1", "BA99").map(Xlsx.colIndex)
      == Seq(0, 1, 25, 26, 27, 52))
  }

  test("parseRows: shared/inline/formula strings, numerics, bools, sparse cells, skipRows") {
    val grid = Xlsx.parseRows(fixture, skipRows = 1)
    assert(grid.size == 6 && grid.forall(_.size == 5))
    assert(grid(0) == Vector("Рег. №", "Бренд", null, "Бренд", "Изображение"))
    assert(grid(3) == Vector("№0001/ТЗ", "Acme", "42", "true", null))
    assert(grid(4) == Vector("№0002/ТЗ", null, "3.5", "false", "prev"))
    assert(grid(5) == Vector("№0003/ТЗ", "Zenith", null, null, null))
    // skipRows=0 keeps the title row
    assert(Xlsx.parseRows(fixture).head.head == "Реестр товарных знаков")
  }

  test("parseImages: anchors, rowOff, drawing order, media payloads") {
    val imgs = Xlsx.parseImages(fixture)
    assert(imgs.map(i => (i.anchorRow, i.rowOffEmu, i.order)) ==
      Vector((4L, 0L, 0L), (5L, 20000L, 1L), (4L, 9999L, 2L), (20L, 0L, 3L)))
    assert(imgs(0).payload.toSeq == pngA.toSeq && imgs(1).payload.toSeq == pngB.toSeq)
    assert(imgs.forall(_.mime == "image/png"))
  }

  test("end-to-end S4+S5: XLSX bytes → promoteHeader → sliceFrom → attachImages == Parquet path") {
    val df = Xlsx.read(spark, fixture, skipRows = 1)
    assert(df.columns.toSeq ==
      Seq(ShapeOps.IndexCol, "column_1", "column_2", "column_3", "column_4", "column_5"))

    val shaped = ShapeOps.sliceFrom(ShapeOps.promoteHeader(df), 3)
    // header dedup: ""→Unnamed_1 (null header cell → UNKNOWN), dup Бренд→Бренд_1
    assert(shaped.columns.toSeq ==
      Seq(ShapeOps.IndexCol, "Рег. №", "Бренд", "UNKNOWN", "Бренд_1", "Изображение"))

    val withImgs = JoinOps.attachImages(
        shaped.drop("Изображение"), Xlsx.readImages(spark, fixture),
        rowCol = "excel_row", payloadCol = "data_url",
        imageOrderCol = "img_order", rowOffset = 1)
      .orderBy(col(ShapeOps.IndexCol))

    def dataUrl(b: Array[Byte]) =
      "data:image/png;base64," + java.util.Base64.getEncoder.encodeToString(b)
    val actual = withImgs
      .select(graft.Cols.q("Рег. №"), col("Бренд"), col("Изображение")).collect().toSeq

    // ---- differential: the identical logical table built natively (the
    // Parquet path), pushed through the SAME ops.
    val schema = StructType(StructField(ShapeOps.IndexCol, LongType) +:
      (1 to 5).map(i => StructField(s"column_$i", StringType)))
    val nativeRows = Seq(
      Row(0L, "Рег. №", "Бренд", null, "Бренд", "Изображение"),
      Row(1L, "x", null, null, null, null),
      Row(2L, "y", null, null, null, null),
      Row(3L, "№0001/ТЗ", "Acme", "42", "true", null),
      Row(4L, "№0002/ТЗ", null, "3.5", "false", "prev"),
      Row(5L, "№0003/ТЗ", "Zenith", null, null, null))
    val native = spark.createDataFrame(
      spark.sparkContext.parallelize(nativeRows), schema)
    val nativeImgs = Seq(
      (5L, 5L, 0L, dataUrl(pngA)), (7L, 5L, 1L, dataUrl(pngB)),
      (5L, 5L, 2L, dataUrl(pngC)), (21L, 5L, 3L, dataUrl(pngA)))
      .toDF("excel_row", "excel_col", "img_order", "data_url")
    val expected = JoinOps.attachImages(
        ShapeOps.sliceFrom(ShapeOps.promoteHeader(native), 3).drop("Изображение"),
        nativeImgs, rowCol = "excel_row", payloadCol = "data_url",
        imageOrderCol = "img_order", rowOffset = 1)
      .orderBy(col(ShapeOps.IndexCol))
      .select(graft.Cols.q("Рег. №"), col("Бренд"), col("Изображение")).collect().toSeq

    assert(actual == expected)
    // and the semantics themselves, pinned:
    assert(actual == Seq(
      Row("№0001/ТЗ", "Acme", s"${dataUrl(pngA)} ${dataUrl(pngC)}"),
      Row("№0002/ТЗ", null, ""),
      Row("№0003/ТЗ", "Zenith", dataUrl(pngB))))
  }

  test("readImages: anchor snap column math matches the reference heuristic") {
    val imgs = Xlsx.readImages(spark, fixture)
      .orderBy(col("img_order"))
      .select(col("excel_row"), col("excel_col")).collect().toSeq
    // A: row4+1=5; B: row5+1+1(snap)=7; C: 9999 EMU ≤ 10000 → no snap; D: 21
    assert(imgs == Seq(Row(5L, 5L), Row(7L, 5L), Row(5L, 5L), Row(21L, 5L)))
  }

  test("colLetters inverts colIndex across multi-letter columns") {
    (0 until 800).foreach { i =>
      assert(Xlsx.colIndex(Xlsx.colLetters(i) + "1") == i, s"at $i: ${Xlsx.colLetters(i)}")
    }
    assert(Seq(0, 25, 26, 51, 52, 701, 702).map(Xlsx.colLetters) ==
      Seq("A", "Z", "AA", "AZ", "BA", "ZZ", "AAA"))
  }

  test("property: write → parseRows is the identity on random string grids") {
    // \r excluded: XML 1.0 line-ending normalization folds it to \n in any
    // compliant reader. Control chars are dropped by the writer (invalid
    // in XML 1.0), so the generator stays in printable + \t + \n space.
    val alphabet = ("abcXYZ аբ中é &<>\"'№/ТЗ._-" + "\t\n").toCharArray
    val rnd = new scala.util.Random(42)
    def randCell(): String =
      if (rnd.nextInt(10) == 0) null
      else if (rnd.nextInt(10) == 0) ""
      else (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 5).foreach { trial =>
      val nCols = 1 + rnd.nextInt(6)
      val nRows = rnd.nextInt(8)
      val header = (1 to nCols).map(i => s"col_$i")
      val data = Vector.fill(nRows)(Vector.fill(nCols)(randCell()))
      val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(data.map(Row.fromSeq(_))).asJava),
        schema)
      val parsed = Xlsx.parseRows(Xlsx.writeBytes(df))
      assert(parsed == (header.toVector +: data), s"trial $trial mismatch")
    }
  }

  test("write → read → promoteHeader restores the original frame") {
    import spark.implicits._
    val df = Seq(("0001/ТЗ", "Acme & Co", "a  b"), ("0002/ТЗ", "<Widget>", ""))
      .toDF("Рег. №", "Бренд", "x")
    val bytes = Xlsx.writeBytes(df)
    val back = ShapeOps.promoteHeader(Xlsx.read(spark, bytes))
    assert(back.columns.toSeq == Seq(ShapeOps.IndexCol, "Рег. №", "Бренд", "x"))
    val rows = back.orderBy(col(ShapeOps.IndexCol))
      .select(graft.Cols.q("Рег. №"), col("Бренд"), col("x")).collect().toSeq
    assert(rows == Seq(Row("0001/ТЗ", "Acme & Co", "a  b"), Row("0002/ТЗ", "<Widget>", "")))
  }

  test("writeBytes caps at the XLSX row limit instead of collecting a corpus") {
    assert(Xlsx.MaxWriteRows == (1 << 20))
  }

  test("readFiles: distributed per-file parse via binaryFile source") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx-corpus")
    java.nio.file.Files.write(dir.resolve("a.xlsx"), fixture)
    java.nio.file.Files.write(dir.resolve("b.xlsx"), fixture)
    val df = Xlsx.readFiles(spark, dir.toString + "/*.xlsx", skipRows = 1)
    assert(df.count() == 12) // 6 grid rows × 2 files
    val firsts = df.filter(col(ShapeOps.IndexCol) === 0)
      .select(col("cells").getItem(0)).as[String].collect().toSeq
    assert(firsts == Seq("Рег. №", "Рег. №"))
  }
}
