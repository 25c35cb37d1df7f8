package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Randomized differential for the XLSX drawing walk: anchors are
  * generated from a structural model (random rows/cols, rowOff values
  * clustered on the 10000-EMU snap boundary, a mix of twoCellAnchor and
  * oneCellAnchor, shared and shuffled media relationships, mixed media
  * extensions, and anchors with no blip that must drop), then rendered
  * to drawing XML + rels + media parts, zipped, and parsed back — the
  * expected (anchor, order, mime, payload) vector and the snapped
  * excel_row both derive from the model before any XML exists. Seeds
  * are pinned so every trial reproduces.
  */
class XlsxImageFuzzSpec extends SparkSpec {

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

  private case class AnchorModel(row: Long, colIdx: Long, rowOff: Long,
      colOff: Long, two: Boolean, rid: Option[String])

  test("fuzz: parseImages and readImages match the structural model") {
    val exts = IndexedSeq("png" -> "image/png", "jpg" -> "image/jpeg",
      "jpeg" -> "image/jpeg", "gif" -> "image/gif", "bmp" -> "image/bmp",
      "webp" -> "application/octet-stream")
    for (trial <- 0 until 5) {
      val rnd = new Random(17700 + trial)
      val media = (1 to 2 + rnd.nextInt(4)).map { i =>
        val (ext, mime) = exts(rnd.nextInt(exts.size))
        val payload = new Array[Byte](1 + rnd.nextInt(16))
        rnd.nextBytes(payload)
        (s"rId$i", s"image$i.$ext", mime, payload)
      }
      val offs = IndexedSeq(0L, 9999L, 10000L, 10001L, 20000L,
        rnd.nextInt(30000).toLong)
      val anchors = (0 until 1 + rnd.nextInt(8)).map { _ =>
        AnchorModel(rnd.nextInt(30).toLong, rnd.nextInt(8).toLong,
          offs(rnd.nextInt(offs.size)), rnd.nextInt(5000).toLong,
          two = rnd.nextBoolean(),
          rid = if (rnd.nextInt(6) == 0) None // no blip: must drop
            else Some(media(rnd.nextInt(media.size))._1))
      }

      def anchorXml(a: AnchorModel): String = {
        val tag = if (a.two) "twoCellAnchor" else "oneCellAnchor"
        val from = s"<xdr:from><xdr:col>${a.colIdx}</xdr:col>" +
          s"<xdr:colOff>${a.colOff}</xdr:colOff><xdr:row>${a.row}</xdr:row>" +
          s"<xdr:rowOff>${a.rowOff}</xdr:rowOff></xdr:from>"
        val to = if (a.two)
          s"<xdr:to><xdr:col>${a.colIdx + 1}</xdr:col><xdr:colOff>0</xdr:colOff>" +
            s"<xdr:row>${a.row + 1}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:to>"
        else s"""<xdr:ext cx="100" cy="100"/>"""
        val pic = a.rid match {
          case Some(r) =>
            s"""<xdr:pic><xdr:blipFill><a:blip r:embed="$r"/></xdr:blipFill></xdr:pic>"""
          case None => "<xdr:sp/>" // a shape, not a picture
        }
        s"<xdr:$tag>$from$to$pic<xdr:clientData/></xdr:$tag>"
      }
      // parser walks twoCellAnchor THEN oneCellAnchor (scala.xml \ order)
      val ordered = anchors.filter(_.two) ++ anchors.filterNot(_.two)
      val drawingXml =
        s"""<xdr:wsDr xmlns:xdr="$nsXdr" xmlns:a="$nsA" xmlns:r="$nsRel">""" +
          anchors.map(anchorXml).mkString + "</xdr:wsDr>"
      val drawingRels =
        s"""<Relationships xmlns="$nsPkgRel">""" + media.map { case (rid, f, _, _) =>
          s"""<Relationship Id="$rid" Type="t" Target="../media/$f"/>"""
        }.mkString + "</Relationships>"
      val sheetXml =
        s"""<worksheet xmlns="$nsMain" xmlns:r="$nsRel"><sheetData>
          |<row r="1"><c r="A1" t="inlineStr"><is><t>x</t></is></c></row>
          |</sheetData><drawing r:id="rId2"/></worksheet>""".stripMargin
      val workbookXml =
        s"""<workbook xmlns="$nsMain" xmlns:r="$nsRel"><sheets>
          |<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
      val workbookRels =
        s"""<Relationships xmlns="$nsPkgRel">
          |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin
      val sheetRels =
        s"""<Relationships xmlns="$nsPkgRel">
          |<Relationship Id="rId2" Type="t" Target="../drawings/drawing1.xml"/>
          |</Relationships>""".stripMargin
      val bytes = zip(Seq(
        "xl/workbook.xml" -> workbookXml.getBytes(UTF_8),
        "xl/_rels/workbook.xml.rels" -> workbookRels.getBytes(UTF_8),
        "xl/worksheets/sheet1.xml" -> sheetXml.getBytes(UTF_8),
        "xl/worksheets/_rels/sheet1.xml.rels" -> sheetRels.getBytes(UTF_8),
        "xl/drawings/drawing1.xml" -> drawingXml.getBytes(UTF_8),
        "xl/drawings/_rels/drawing1.xml.rels" -> drawingRels.getBytes(UTF_8)) ++
        media.map { case (_, f, _, p) => s"xl/media/$f" -> p })

      val mediaByRid = media.map(m => m._1 -> m).toMap
      val want = ordered.flatMap(a => a.rid.map(r => (a, mediaByRid(r))))
        .zipWithIndex.map { case ((a, (_, _, mime, payload)), i) =>
          (a.row, a.colIdx, a.rowOff, a.colOff, i.toLong, mime,
            payload.toVector)
        }
      val got = Xlsx.parseImages(bytes).map(ia =>
        (ia.anchorRow, ia.anchorCol, ia.rowOffEmu, ia.colOffEmu, ia.order,
          ia.mime, ia.payload.toVector))
      assert(got == want, s"trial $trial parseImages:\n got=$got\nwant=$want")

      val gotRead = Xlsx.readImages(spark, bytes)
        .orderBy(col("img_order"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toVector
      val wantRead = want.map { case (row, colIdx, off, _, order, mime, p) =>
        (row + 1 + (if (off > 10000) 1L else 0L), colIdx + 1, order,
          s"data:$mime;base64," +
            java.util.Base64.getEncoder.encodeToString(p.toArray))
      }
      assert(gotRead == wantRead, s"trial $trial readImages")
    }
  }
}
