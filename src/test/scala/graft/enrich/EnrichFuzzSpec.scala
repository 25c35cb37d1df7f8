package graft.enrich

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized differential for the L4 enrichment decision tree: the
  * pure-plan form ([[Enrichment.process]], column algebra) and the
  * service form ([[ServiceEnrichment.process]], an INDEPENDENT
  * imperative mapPartitions with its own exclusion regex, row-text
  * concat, and branch logic) must agree on every random row — exclusion
  * boundary cases (spaced letters, ё-folding, cyrillic vs non-cyrillic
  * neighbors, the token hiding in a non-brand column), OCR firing
  * (null/empty/whitespace brands × null/empty/present images), and the
  * RECOG strip before variant generation.
  *
  * RussianCol is excluded from the plan-vs-service comparison by
  * design: the two STUBS deliberately differ there (StubProvider emits
  * [brand-ру, reverse(brand)], StubLlmClient [brand-ру]) — the oracled
  * query q_enrich_pipeline pins the plan form, and the L3 differential
  * in EnrichmentSpec pins the service form against itself.
  */
class EnrichFuzzSpec extends SparkSpec {
  import spark.implicits._

  // Brand pool stressing every branch: empty/whitespace (no OCR when the
  // cell is whitespace — isEmpty, not isBlank), excluded markers in
  // every disguise, and near-misses that must NOT trip the flag.
  private val brands: Seq[String] = Seq(
    null, "", " ", "Nike", "adidas", "Тест Бренд",
    "Товар исключен", "ИСКЛЮЧЕН", "исключён", "и с к л ю ч е н",
    "неисключен",      // preceded by cyrillic → NOT excluded
    "исключений",      // followed by cyrillic → NOT excluded
    "xисключен",       // preceded by latin (non-cyrillic) → excluded
    "включен")
  private val images: Seq[String] = Seq(
    null, "", "data:image/png;base64,AAAA", "data:image/png;base64,QkJC")
  private val notes: Seq[String] = Seq(
    null, "", "примечание", "исключен из реестра", "заключение",
    "отчет исключений", "ИсКлЮчЕн!", "exclusion")

  private def pick[T](rnd: Random, xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

  test("plan and service enrichment agree on random rows (L4 differential fuzz)") {
    val rnd = new Random(171)
    for (trial <- 1 to 3) {
      val rows = (1 to 60).map { i =>
        (i.toLong, pick(rnd, brands), pick(rnd, images), pick(rnd, notes),
          rnd.nextInt(1000) / 100.0)
      }
      val df = rows.toDF("id", "brand", "image", "note", "score")
      val compareCols = Seq(col("id"), col("brand"), col("note"), col("score"),
        graft.Cols.q(Enrichment.EnglishCol), graft.Cols.q(Enrichment.ExcludedCol))
      val viaPlan = Enrichment.process(df, "brand", "image")
        .select(compareCols: _*).orderBy("id").collect().map(_.toSeq).toSeq
      val viaService = ServiceEnrichment.process(df, "brand", "image", new StubLlmClient)
        .select(compareCols: _*).orderBy("id").collect().map(_.toSeq).toSeq
      val diffs = viaPlan.zip(viaService).filter { case (a, b) => a != b }
      assert(diffs.isEmpty,
        s"trial $trial: ${diffs.size} rows disagree; first: ${diffs.take(3)}")
    }
  }

  test("correction stringification: column path equals in-partition path on random typed rows") {
    // The L3 differential of EnrichmentSpec on RANDOM typed content:
    // null timestamps/doubles/strings must stringify identically through
    // the to_json→map→coalesce column path and the mapPartitions path
    // (SQL cast rendering, null→"", fall-back-to-original).
    val rnd = new Random(172)
    for (trial <- 1 to 2) {
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = (1 to 40).map { i =>
        (i.toLong, pick(rnd, brands), pick(rnd, images),
          if (rnd.nextBoolean()) new java.sql.Timestamp(base + rnd.nextInt(100000) * 1000L)
          else null,
          if (rnd.nextBoolean()) java.lang.Double.valueOf(rnd.nextInt(10000) / 100.0)
          else null)
      }
      val df = rows.toDF("id", "brand", "image", "seen_at", "score")
      val client = new StubLlmClient
      val enriched = ServiceEnrichment.process(df, "brand", "image", client)
      val viaPlan = Enrichment.correctRows(enriched)
        .orderBy(col("id").cast("long")).collect().map(_.toSeq).toSeq
      val viaService = ServiceEnrichment.process(df, "brand", "image",
          client, correction = true)
        .orderBy(col("id").cast("long")).collect().map(_.toSeq).toSeq
      val diffs = viaPlan.zip(viaService).filter { case (a, b) => a != b }
      assert(diffs.isEmpty,
        s"trial $trial: ${diffs.size} rows disagree; first: ${diffs.take(3)}")
      assert(viaService.flatten.forall(v => v != null && v.isInstanceOf[String]),
        "correction output must be all-string with nulls flattened")
    }
  }
}
