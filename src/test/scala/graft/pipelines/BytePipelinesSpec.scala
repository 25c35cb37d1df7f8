package graft.pipelines

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ShapeOps
import graft.sources.{Docx, Xlsx}

/** The complete reference user journey, byte to byte: raw workbook /
  * document BYTES → native parse → country pipeline → enriched registry →
  * XLSX delivery bytes. Before round 6 the pipelines started at staged
  * Parquet; with the native readers and writer the whole handler flow
  * (handlers/belarus.py `process`, handlers/kyrgyzstan.py `process`)
  * runs inside the engine.
  */
class BytePipelinesSpec extends SparkSpec {

  private def zip(parts: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    parts.foreach { case (n, b) =>
      zos.putNextEntry(new ZipEntry(n)); zos.write(b); zos.closeEntry()
    }
    zos.close(); bos.toByteArray
  }

  private val nsMain = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val nsRel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val nsPkgRel = "http://schemas.openxmlformats.org/package/2006/relationships"
  private val nsXdr = "http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing"
  private val nsA = "http://schemas.openxmlformats.org/drawingml/2006/main"

  /** Belarus-shaped workbook: title row, header row, a junk row, then
    * three data rows — one normal, one with an empty brand cell + an
    * embedded image (the OCR path), one excluded.
    */
  private def belarusXlsx: Array[Byte] = {
    def is(s: String) = s"""<c t="inlineStr"><is><t xml:space="preserve">$s</t></is></c>"""
    val sheet =
      s"""<worksheet xmlns="$nsMain" xmlns:r="$nsRel"><sheetData>
        |<row>${is("Реестр")}</row>
        |<row>${is("Рег. №")}${is("Бренд")}${is("Изображение")}</row>
        |<row>${is("junk")}${is("junk")}${is("junk")}</row>
        |<row>${is("№0001/ТЗ")}${is(" Acme ")}${is("")}</row>
        |<row>${is("№0002/ТЗ")}${is("")}${is("")}</row>
        |<row>${is("№0003/ТЗ исключен")}${is("Zenith")}${is("")}</row>
        |</sheetData><drawing r:id="rId2"/></worksheet>""".stripMargin
    val drawing =
      s"""<xdr:wsDr xmlns:xdr="$nsXdr" xmlns:a="$nsA" xmlns:r="$nsRel">
        |<xdr:oneCellAnchor><xdr:from><xdr:col>2</xdr:col><xdr:colOff>0</xdr:colOff>
        |<xdr:row>5</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:from>
        |<xdr:pic><xdr:blipFill><a:blip r:embed="rId1"/></xdr:blipFill></xdr:pic>
        |</xdr:oneCellAnchor></xdr:wsDr>""".stripMargin
    zip(Seq(
      "xl/workbook.xml" ->
        (s"""<workbook xmlns="$nsMain" xmlns:r="$nsRel"><sheets>""" +
          """<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""").getBytes(UTF_8),
      "xl/_rels/workbook.xml.rels" ->
        (s"""<Relationships xmlns="$nsPkgRel">""" +
          """<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""").getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(UTF_8),
      "xl/worksheets/_rels/sheet1.xml.rels" ->
        (s"""<Relationships xmlns="$nsPkgRel">""" +
          """<Relationship Id="rId2" Type="t" Target="../drawings/drawing1.xml"/></Relationships>""").getBytes(UTF_8),
      "xl/drawings/drawing1.xml" -> drawing.getBytes(UTF_8),
      "xl/drawings/_rels/drawing1.xml.rels" ->
        (s"""<Relationships xmlns="$nsPkgRel">""" +
          """<Relationship Id="rId1" Type="t" Target="../media/image1.png"/></Relationships>""").getBytes(UTF_8),
      "xl/media/image1.png" -> Array[Byte](1, 2, 3, 4)))
  }

  test("belarus: XLSX bytes → parse → pipeline → enriched registry → XLSX bytes") {
    val bytes = belarusXlsx
    val staged = Xlsx.read(spark, bytes, skipRows = 1)
    val images = Xlsx.readImages(spark, bytes)
      .withColumnRenamed("data_url", "b64")
    val out = RegistryPipelines.belarus(staged, images, brandCol = "Бренд")
      .orderBy(col(ShapeOps.IndexCol))

    val rows = out.select(graft.Cols.q("Рег. №"), col("Бренд"),
        col("Изображение"), graft.Cols.q(graft.enrich.Enrichment.EnglishCol),
        col(graft.enrich.Enrichment.ExcludedCol))
      .collect().toSeq
    assert(rows.size == 3)
    // normal row: brand trimmed, variants generated
    assert(rows(0).getString(0) == "№0001/ТЗ" && rows(0).getString(1) == "Acme")
    assert(rows(0).getString(3) == "ACME, acme" && rows(0).getString(4) == "Нет")
    // OCR row: anchored image became the data-URL payload, brand recognized
    val dataUrl = "data:image/png;base64," +
      java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3, 4))
    assert(rows(1).getString(2) == dataUrl)
    assert(rows(1).getString(1).startsWith("OCR-") &&
      rows(1).getString(1).endsWith(" (RECOG)"))
    assert(rows(1).getString(4) == "Нет")
    // excluded row: flagged, untouched by enrichment
    assert(rows(2).getString(1) == "Zenith" && rows(2).getString(4) == "Да")
    assert(rows(2).isNullAt(3))

    // delivery: write the enriched registry back to workbook bytes and
    // re-parse — the grid must carry the final columns and all 3 records
    val deliverable = out.drop(ShapeOps.IndexCol)
    val delivered = Xlsx.parseRows(Xlsx.writeBytes(deliverable))
    assert(delivered.head == deliverable.columns.toVector)
    assert(delivered.size == 4)
    assert(delivered(3)(deliverable.columns.indexOf("Бренд")) == "Zenith")
  }

  test("kazakhstan: XLSX bytes with skip_rows=3 → column repair + NFKC clean → enrichment") {
    def is(s: String) = s"""<c t="inlineStr"><is><t xml:space="preserve">$s</t></is></c>"""
    val sheet =
      s"""<worksheet xmlns="$nsMain" xmlns:r="$nsRel"><sheetData>
        |<row>${is("Реестр")}</row>
        |<row>${is("за 2024")}</row>
        |<row>${is("")}</row>
        |<row>${is("Рег. №")}${is("Наименова ние")}${is("Цена/шт")}</row>
        |<row>${is("junk")}${is("junk")}${is("junk")}</row>
        |<row>${is("№0001/ТЗ")}${is("Acme ﬁne")}${is("x")}</row>
        |</sheetData></worksheet>""".stripMargin
    val bytes = zip(Seq(
      "xl/workbook.xml" ->
        (s"""<workbook xmlns="$nsMain" xmlns:r="$nsRel"><sheets>""" +
          """<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""").getBytes(UTF_8),
      "xl/_rels/workbook.xml.rels" ->
        (s"""<Relationships xmlns="$nsPkgRel">""" +
          """<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""").getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(UTF_8)))

    import spark.implicits._
    val staged = Xlsx.read(spark, bytes, skipRows = 3)
    val noImages = Seq.empty[(Long, Long, String)].toDF("excel_row", "img_order", "b64")
    val out = RegistryPipelines.kazakhstan(staged, noImages, brandCol = "Наименование")
    // P4 column repair: the line-broken header heals, "/" becomes " или "
    assert(out.columns.contains("Наименование") && out.columns.contains("Цена или шт"))
    val row = out.select(graft.Cols.q("Рег. №"), col("Наименование"),
      graft.Cols.q(graft.enrich.Enrichment.EnglishCol)).collect()(0)
    // T2 NFKC, faithful to the reference (kazakhstan.py:154-179): the ﬁ
    // ligature decomposes to "fi", and № itself NFKC-decomposes to "No"
    // with "/" outside the keep-whitelist — the reg cell really does come
    // out as "No0001ТЗ" in the reference's Kazakhstan pipeline.
    assert(row.getString(0) == "No0001ТЗ" && row.getString(1) == "Acme fine")
    assert(row.getString(2) == "ACME FINE, acme fine")
  }

  test("kyrgyzstan: DOCX bytes → parse → pipeline → merged enriched records") {
    def tc(s: String) = s"""<w:tc><w:p><w:r><w:t xml:space="preserve">$s</w:t></w:r></w:p></w:tc>"""
    val w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val doc =
      s"""<w:document xmlns:w="$w"><w:body><w:tbl>
        |<w:tr>${tc("Рег. №")}${tc("Наименование")}</w:tr>
        |<w:tr>${tc("junk")}${tc("junk")}</w:tr>
        |<w:tr>${tc("№ 0001 / ТЗ")}${tc("Widget")}</w:tr>
        |<w:tr>${tc("")}${tc("continued")}</w:tr>
        |<w:tr>${tc("Name: footer")}${tc("drop me")}</w:tr>
        |<w:tr>${tc("№0002/ТЗ")}${tc("Gadget исключен")}</w:tr>
        |</w:tbl></w:body></w:document>""".stripMargin
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    zos.write(doc.getBytes(UTF_8)); zos.closeEntry(); zos.close()

    val staged = ShapeOps.sliceFrom(
      ShapeOps.promoteHeader(Docx.readTables(spark, bos.toByteArray)), 2)
    val out = RegistryPipelines.kyrgyzstan(staged,
        regNumCol = "Рег. №", brandCol = "Наименование")
      .orderBy(col("record_id"))
      .select(graft.Cols.q("Рег. №"), col("Наименование"),
        col(graft.enrich.Enrichment.ExcludedCol))
      .collect().toSeq
    assert(out.size == 2)
    // record 1: reg number normalized, continuation folded in
    assert(out(0).getString(0) == "0001/ТЗ")
    assert(out(0).getString(1) == "Widget continued")
    assert(out(0).getString(2) == "Нет")
    // record 2: excluded by its row text
    assert(out(1).getString(0) == "0002/ТЗ")
    assert(out(1).getString(2) == "Да")
  }
}
