package graft.pipelines

import graft.SparkSpec
import graft.enrich.Enrichment
import graft.ops.ShapeOps
import org.apache.spark.sql.functions._

/** End-to-end country pipelines over mini staged frames shaped like the
  * reference's registries (FIXTURES.md §A).
  */
class RegistryPipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("belarus: header promote, slice, trim, image join, enrichment in one plan") {
    // staged rows: header at _idx 0, one junk row, then data — slice(2)
    // drops header + junk (the reference's ROW_OFFSET=2 counts the header
    // row itself, belarus.py:112-115)
    val staged = ShapeOps.withIndex(Seq(
      (0L, "Бренд", "Описание"),
      (1L, "шапка", "мусор"),
      (2L, " Nike ", " спорт "),
      (3L, "", "обувь"),
      (4L, "Adidas исключен", "x"))
      .toDF("ord", "c1", "c2"), col("ord")).drop("ord")
    // image for the second data row (_idx 3 → excel_row = 3+2+1 = 6)
    val images = Seq((6L, 1, "b64payload")).toDF("excel_row", "img_order", "b64")

    val out = RegistryPipelines.belarus(staged, images, brandCol = "Бренд")
      .orderBy(ShapeOps.IndexCol).collect()

    assert(out.length == 3)
    assert(out(0).getAs[String]("Бренд") == "Nike")                 // trimmed
    assert(out(0).getAs[String](Enrichment.EnglishCol) == "NIKE, nike")
    assert(out(1).getAs[String]("Бренд").endsWith(" (RECOG)"))      // OCR fired
    assert(out(1).getAs[String]("Изображение") == "b64payload")
    assert(out(2).getAs[String](Enrichment.ExcludedCol) == "Да")    // excluded
  }

  test("kazakhstan: column repair + NFKC cleaning flow through") {
    val staged = ShapeOps.withIndex(Seq(
      (0L, "Наименова  ние", "Код/Описание"),
      (1L, "x", "x"),
      (2L, "ﬁrma №1", "данные"))
      .toDF("ord", "c1", "c2"), col("ord")).drop("ord")
    val images = Seq.empty[(Long, Int, String)].toDF("excel_row", "img_order", "b64")

    val out = RegistryPipelines.kazakhstan(staged, images, brandCol = "Наименование")
    assert(out.columns.contains("Наименование"))          // name repaired
    assert(out.columns.contains("Код или Описание"))      // slash → " или "
    val row = out.orderBy(ShapeOps.IndexCol).collect()(0)
    // NFKC: ﬁ → fi; № → No (same as the reference's unicodedata.normalize)
    assert(row.getAs[String]("Наименование") == "firma No1")
  }

  test("kyrgyzstan: clean, normalize, merge continuations, enrich") {
    val staged = ShapeOps.withIndex(Seq(
      (0L, "№ 1234 / ТЗ", "Nike"),
      (1L, "", "спортивная обувь"),
      (2L, "Name: footer", "junk"),
      (3L, "№5678", "Puma"))
      .toDF("ord", "Рег. №", "Наименование"), col("ord")).drop("ord")

    val out = RegistryPipelines.kyrgyzstan(staged,
        regNumCol = "Рег. №", brandCol = "Наименование")
      .orderBy("record_id").collect()

    assert(out.length == 2)
    assert(out(0).getAs[String]("Рег. №") == "1234/ТЗ")
    assert(out(0).getAs[String]("Наименование") == "Nike спортивная обувь")
    assert(out(0).getAs[String](Enrichment.EnglishCol) ==
      "NIKE СПОРТИВНАЯ ОБУВЬ, nike спортивная обувь")
    assert(out(1).getAs[String]("Рег. №") == "5678")
  }
}
