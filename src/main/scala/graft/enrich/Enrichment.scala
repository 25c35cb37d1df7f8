package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** L4 — the reference's per-row enrichment driver (`process_table`,
  * utils/gpt.py:180-462) re-expressed as ONE declarative Spark plan:
  *
  *  1. exclusion flag over the whole-row text (F1) — excluded rows bypass
  *     all enrichment (utils/gpt.py:398-406);
  *  2. OCR fires only when the brand cell is empty and an image is present
  *     (utils/gpt.py:408-423), result tagged " (RECOG)";
  *  3. brand-variant generation fires when the (possibly OCR-filled) brand
  *     is non-empty; the " (RECOG)" tag is stripped before the call; arrays
  *     are flattened to ", "-joined cells (utils/gpt.py:425-445);
  *  4. "Исключено" = Да/Нет flag (utils/gpt.py:404,447-448).
  *
  * The reference runs this as O(rows) serial LLM round-trips; here the
  * decision tree is pure column algebra (`when`/`otherwise`) so Catalyst
  * optimizes across it, and the effectful providers are pluggable.
  */
trait EnrichmentProvider extends Serializable {
  /** Recognized text from an image payload (L1). Column-level so stub
    * implementations stay inside codegen.
    */
  def ocr(image: Column): Column
  /** struct<english_samples: array<string>, russian_samples: array<string>> (L2). */
  def brandVariants(brand: Column, description: Column): Column
  /** map<string,string> corrected row (L3). */
  def correctRow(rowJson: Column): Column
}

/** Deterministic offline provider: pure column expressions, so the whole
  * enrichment plan is SQL-expressible and oracle-checkable. A production
  * provider would issue batched service calls from `ServiceEnrichment`.
  */
object StubProvider extends EnrichmentProvider {
  override def ocr(image: Column): Column =
    concat(lit("OCR-"), substring(md5(image), 1, 8))

  override def brandVariants(brand: Column, description: Column): Column = {
    val b = trim(brand)
    struct(
      array(upper(b), lower(b)).as("english_samples"),
      array(concat(b, lit("-ру")), reverse(b)).as("russian_samples"))
  }

  override def correctRow(rowJson: Column): Column =
    from_json(rowJson, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
}

object Enrichment {

  val ExcludedCol = "Исключено"
  val EnglishCol = "Вариации бренда на англ. языке"
  val RussianCol = "Вариации бренда на рус. языке"

  def process(
      df: DataFrame,
      brandCol: String,
      imageCol: String,
      descriptionCol: Option[String] = None,
      provider: EnrichmentProvider = StubProvider): DataFrame = {

    val rowCols = df.columns.toIndexedSeq.map(c => graft.Cols.q(c).cast("string"))
    val excluded = TextOps.isExcluded(TextOps.rowConcat(rowCols))

    val brand0 = coalesce(graft.Cols.q(brandCol), lit(""))
    val image = coalesce(graft.Cols.q(imageCol), lit(""))

    // Step 2: conditional OCR — empty brand + present image, and not excluded
    // (excluded rows `continue` before reaching OCR in the reference).
    val ocrFires = !excluded && brand0 === "" && image =!= ""
    val brand1 = when(ocrFires, TextOps.addRecogTag(provider.ocr(graft.Cols.q(imageCol))))
      .otherwise(brand0)

    // Step 3: conditional brand variants on the updated brand value.
    val enrichFires = !excluded && trim(brand1) =!= ""
    val plainBrand = TextOps.stripRecogTag(brand1)
    val desc = descriptionCol.map(c => graft.Cols.q(c)).getOrElse(lit(null).cast("string"))
    val variants = provider.brandVariants(plainBrand, desc)

    df.withColumn(brandCol, brand1)
      .withColumn(EnglishCol,
        when(enrichFires, TextOps.joinSamples(variants.getField("english_samples"))))
      .withColumn(RussianCol,
        when(enrichFires, TextOps.joinSamples(variants.getField("russian_samples"))))
      .withColumn(ExcludedCol, when(excluded, "Да").otherwise("Нет"))
  }

  /** L3 — row correction over the whole frame, column form (reference
    * step 5, utils/gpt.py:451-458): each row is serialized to a JSON
    * object of stringified cells (null→"", the reference's `str(v or "")`),
    * corrected by the provider into a field→value map, and re-projected.
    * Per-field coalesce implements fall-back-to-original: a null/missing
    * corrected field keeps the original stringified value, and an entirely
    * failed correction (null map) keeps the whole row. Output is
    * all-string, like the reference's processed_rows.
    */
  def correctRows(
      df: DataFrame,
      provider: EnrichmentProvider = StubProvider): DataFrame = {
    val cols = df.columns.toIndexedSeq
    val asStr = (c: String) => coalesce(graft.Cols.q(c).cast("string"), lit(""))
    val rowJson = to_json(struct(cols.map(c => asStr(c).as(c)): _*))
    val corrected = provider.correctRow(rowJson)
    df.select(cols.map(c =>
      coalesce(element_at(corrected, c), asStr(c)).as(c)): _*)
  }
}
