package graft.enrich

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L4 enrichment decision tree (utils/gpt.py:180-462) — both the pure-plan
  * form and the mapPartitions service form, against the same fixtures.
  */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  // (id, brand, image, note) covering the four decision-tree branches
  private def fixtures = Seq(
    (1L, "Nike", "", "plain brand, no image"),
    (2L, "", "data:image/png;base64,AAAA", "empty brand + image → OCR"),
    (3L, "", "", "nothing → no enrichment"),
    (4L, "Товар исключен", "", "excluded row skips all enrichment"))
    .toDF("id", "brand", "image", "note")

  test("pure-plan enrichment: branch semantics") {
    val r = Enrichment.process(fixtures, "brand", "image")
      .orderBy("id").collect()

    // 1: brand enrichment fires
    assert(r(0).getAs[String]("brand") == "Nike")
    assert(r(0).getAs[String](Enrichment.EnglishCol) == "NIKE, nike")
    assert(r(0).getAs[String](Enrichment.ExcludedCol) == "Нет")

    // 2: OCR fires, result tagged, then enrichment on OCR text
    val b2 = r(1).getAs[String]("brand")
    assert(b2.startsWith("OCR-") && b2.endsWith(" (RECOG)"))
    assert(r(1).getAs[String](Enrichment.EnglishCol) != null)

    // 3: nothing fires
    assert(r(2).getAs[String]("brand") == "")
    assert(r(2).isNullAt(r(2).fieldIndex(Enrichment.EnglishCol)))
    assert(r(2).getAs[String](Enrichment.ExcludedCol) == "Нет")

    // 4: excluded — no OCR, no variants, flag set
    assert(r(3).getAs[String]("brand") == "Товар исключен")
    assert(r(3).isNullAt(r(3).fieldIndex(Enrichment.EnglishCol)))
    assert(r(3).getAs[String](Enrichment.ExcludedCol) == "Да")
  }

  test("service enrichment: same branch semantics via mapPartitions") {
    val r = ServiceEnrichment.process(fixtures, "brand", "image", new StubLlmClient)
      .orderBy("id").collect()
    assert(r(0).getAs[String](Enrichment.EnglishCol) == "NIKE, nike")
    assert(r(1).getAs[String]("brand").endsWith(" (RECOG)"))
    assert(r(2).isNullAt(r(2).fieldIndex(Enrichment.EnglishCol)))
    assert(r(3).getAs[String](Enrichment.ExcludedCol) == "Да")
    assert(r(3).isNullAt(r(3).fieldIndex(Enrichment.EnglishCol)))
  }

  test("row correction: stub column path and service path agree (L3 differential)") {
    // Same service enrichment on both sides; what differs is the L3 step:
    // column-path JSON-roundtrip correction vs in-partition correctRow
    // with correction=true. Both must produce the same all-string rows
    // (null→"" stringification, fall-back-to-original). The typed extras
    // (timestamp, double) pin that the service path stringifies via SQL
    // cast, not JVM toString ("2024-01-01 10:00:00" vs "...10:00:00.0").
    val typed = fixtures
      .withColumn("seen_at",
        to_timestamp(lit("2024-01-01 10:00:00"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("score", col("id").cast("double") / 2)
    val client = new StubLlmClient
    val viaPlan = Enrichment.correctRows(
        ServiceEnrichment.process(typed, "brand", "image", client))
      .orderBy("id").collect().map(_.toSeq)
    val viaService = ServiceEnrichment.process(typed, "brand", "image",
        client, correction = true)
      .orderBy("id").collect().map(_.toSeq)
    assert(viaPlan.toSeq == viaService.toSeq)
    // Correction output is all-string with nulls flattened to "".
    assert(viaService.flatten.forall(v => v != null && v.isInstanceOf[String]))
  }

  test("failed service correction falls back to the original stringified row") {
    val failing = new StubLlmClient {
      override def correctRow(row: Map[String, String]) = None
    }
    // Explicit null VALUES in a returned map must also fall back per-field.
    val nullish = new StubLlmClient {
      override def correctRow(row: Map[String, String]) =
        Some(row.map { case (k, _) => k -> (null: String) })
    }
    val viaNullMap = ServiceEnrichment.process(fixtures, "brand", "image",
        nullish, correction = true)
      .orderBy("id").collect()
    assert(viaNullMap(0).getAs[String]("brand") == "Nike")
    assert(viaNullMap.flatMap(_.toSeq).forall(_ != null))
    val out = ServiceEnrichment.process(fixtures, "brand", "image",
        failing, correction = true)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("brand") == "Nike")            // original survives
    assert(out(0).getAs[String](Enrichment.EnglishCol) == "NIKE, nike")
    assert(out(2).getAs[String](Enrichment.EnglishCol) == "")  // null → ""
  }

  test("excluded detection uses the whole row text, not just the brand column") {
    val df = Seq((1L, "Nike", "", "примечание: исключен из реестра"))
      .toDF("id", "brand", "image", "note")
    val r = Enrichment.process(df, "brand", "image").collect()(0)
    assert(r.getAs[String](Enrichment.ExcludedCol) == "Да")
  }
}
