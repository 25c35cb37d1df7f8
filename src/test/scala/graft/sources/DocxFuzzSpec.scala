package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.util.Random

import graft.SparkSpec

/** Randomized differential for the native DOCX table reader: tables are
  * generated from a STRUCTURAL model (grid width, spans, vMerge
  * restarts/continuations, multi-paragraph cells with tabs and breaks),
  * the expected python-docx `row.cells` expansion is derived from that
  * model BEFORE any XML exists, and the document is then rendered to
  * OOXML, zipped, and parsed back — so the differential exercises the
  * XML rendering, the zip walk, namespace-blind attribute handling, and
  * the gridSpan/vMerge expansion together. Seeds are pinned so every
  * trial reproduces.
  */
class DocxFuzzSpec extends SparkSpec {

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

  /** One cell's content model: paragraphs of (text | tab | break) runs. */
  private case class CellModel(paras: Vector[Vector[String]]) {
    def text: String = paras.map(_.map {
      case "\t" => "\t"
      case "\n" => "\n"
      case s => s
    }.mkString).mkString("\n")
    def xml: String = {
      val ps = paras.map { runs =>
        "<w:p><w:r>" + runs.map {
          case "\t" => "<w:tab/>"
          case "\n" => "<w:br/>"
          case s => s"""<w:t xml:space="preserve">$s</w:t>"""
        }.mkString + "</w:r></w:p>"
      }.mkString
      ps
    }
  }

  private def randCell(rnd: Random): CellModel = {
    val words = IndexedSeq("reg", "name 7", "x", "Широкий", "v42", "")
    CellModel(Vector.fill(1 + rnd.nextInt(2)) {
      Vector.fill(1 + rnd.nextInt(3)) {
        rnd.nextInt(6) match {
          case 0 => "\t"
          case 1 => "\n"
          case _ => words(rnd.nextInt(words.size))
        }
      }
    })
  }

  test("fuzz: parseTables matches the structural-model expansion") {
    for (trial <- 0 until 6) {
      val rnd = new Random(17600 + trial)
      val tables = Vector.fill(1 + rnd.nextInt(3)) {
        val nCols = 2 + rnd.nextInt(4)
        val nRows = 1 + rnd.nextInt(7)
        var prev: Vector[String] = Vector.fill(nCols)("")
        Vector.fill(nRows) {
          // build one FULL row: cells cover the grid exactly
          val cells = Vector.newBuilder[(Int, Boolean, Boolean, CellModel)]
          var g = 0
          while (g < nCols) {
            val span = 1 + rnd.nextInt(math.min(3, nCols - g))
            val cont = prev.nonEmpty && rnd.nextInt(3) == 0
            val restartTag = !cont && rnd.nextInt(4) == 0
            cells += ((span, cont, restartTag, randCell(rnd)))
            g += span
          }
          val row = cells.result()
          // expected expansion: continuation takes the EXPANDED text of
          // the previous row at the cell's STARTING grid column
          val expanded = Vector.newBuilder[String]
          var gc = 0
          row.foreach { case (span, cont, _, cm) =>
            val t = if (cont) prev(gc) else cm.text
            (0 until span).foreach { _ => expanded += t; gc += 1 }
          }
          prev = expanded.result()
          (row, prev)
        }
      }
      val xml = tables.map { rows =>
        "<w:tbl>" + rows.map { case (row, _) =>
          "<w:tr>" + row.map { case (span, cont, restartTag, cm) =>
            val pr =
              if (span > 1 || cont || restartTag)
                "<w:tcPr>" +
                  (if (span > 1) s"""<w:gridSpan w:val="$span"/>""" else "") +
                  (if (cont) "<w:vMerge/>"
                   else if (restartTag) """<w:vMerge w:val="restart"/>"""
                   else "") +
                "</w:tcPr>"
              else ""
            s"<w:tc>$pr${cm.xml}</w:tc>"
          }.mkString + "</w:tr>"
        }.mkString + "</w:tbl>"
      }.mkString
      val bytes = docx(
        s"""<w:document xmlns:w="$w"><w:body>$xml</w:body></w:document>""")

      val got = Docx.parseTables(bytes)
      val want = tables.map(_.map(_._2))
      assert(got == want, s"trial $trial:\n got=$got\nwant=$want")

      // readTables: strip + global ragged pad + _idx order
      val gotDf = Docx.readTables(spark, bytes)
        .collect()
        .map(r => (r.getLong(0), (1 until r.length).map(r.getString).toVector))
        .sortBy(_._1).map(_._2).toVector
      val all = want.flatten.map(_.map(_.strip))
      val width = all.map(_.size).max
      val wantDf = all.map(_.padTo(width, ""))
      assert(gotDf == wantDf, s"trial $trial readTables")
    }
  }
}
