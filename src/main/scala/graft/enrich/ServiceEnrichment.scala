package graft.enrich

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Executor-side enrichment for real (remote-service) providers — the scale
  * path for the reference's per-row LLM calls (utils/gpt.py:148-381).
  *
  * The reference issues O(rows) serial round-trips from one process; here
  * each Spark task drains its partition through a client instantiated once
  * per partition (connection reuse), so throughput scales with the number
  * of tasks and the service-side concurrency limit, not with driver time.
  * Retry/backoff lives in the client, mirroring the reference's policy
  * (≤5 attempts, 2 s initial delay, ×2 backoff — utils/gpt.py:104-143).
  *
  * Kept at the plan edge: everything below the `mapPartitions` barrier is
  * still a normal Catalyst plan, so pushdown/pruning apply to the scan.
  */
trait LlmClient extends Serializable {
  def recognizeImage(imagePayload: String): Option[String]
  /** returns (english_samples, russian_samples) */
  def brandSamples(prompt: String): (Seq[String], Seq[String])
  /** L3 — corrected row as a field→value map; None (or a raised error,
    * after the client's own retry policy) means the caller keeps the
    * original row stringified with null→"" — the reference's
    * fall-back-to-original contract (utils/gpt.py:451-458).
    */
  def correctRow(row: Map[String, String]): Option[Map[String, String]]
}

/** Deterministic offline double, keyed by input content — stands in for the
  * remote model in tests (FIXTURES.md §B.8). Every method mirrors
  * [[StubProvider]]'s column form — OCR is the same md5-keyed transform,
  * `correctRow` the same identity roundtrip — so the column path, the
  * service path, AND the DuckDB oracle stay differentially comparable
  * (`q_service_enrich` is hash-checked against SQL that reproduces this
  * stub exactly).
  */
class StubLlmClient extends LlmClient {
  override def recognizeImage(imagePayload: String): Option[String] =
    if (imagePayload.isEmpty) None
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(imagePayload.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      Some("OCR-" + hex.take(8))
    }

  override def brandSamples(prompt: String): (Seq[String], Seq[String]) =
    (Seq(prompt.toUpperCase, prompt.toLowerCase), Seq(prompt + "-ру"))

  override def correctRow(row: Map[String, String]): Option[Map[String, String]] =
    Some(row)
}

object ServiceEnrichment {

  /** Same decision tree as [[Enrichment.process]], but with the effectful
    * steps executed per partition against `client`. With
    * `correction = true` each enriched row additionally passes through
    * `client.correctRow` (reference step 5, utils/gpt.py:451-458): every
    * cell is stringified with null→"" (the output schema becomes
    * all-string, as the reference's `str(v or "")` does), a returned map
    * replaces the row field-by-field, and a None/raised correction keeps
    * the original stringified values.
    */
  def process(
      df0: DataFrame,
      brandCol: String,
      imageCol: String,
      client: LlmClient,
      correction: Boolean = false): DataFrame = {

    // Under correction, stringify IN THE PLAN (SQL cast + coalesce '') so
    // cell rendering matches Enrichment.correctRows exactly — JVM
    // toString diverges from cast('string') for timestamps, arrays, etc.
    val df =
      if (correction)
        df0.select(df0.columns.toIndexedSeq.map(c =>
          org.apache.spark.sql.functions.coalesce(
            graft.Cols.q(c).cast(StringType),
            org.apache.spark.sql.functions.lit("")).as(c)): _*)
      else df0

    val inSchema = df.schema
    val enrichedFields = inSchema.fields ++ Seq(
      StructField(Enrichment.EnglishCol, StringType, nullable = true),
      StructField(Enrichment.RussianCol, StringType, nullable = true),
      StructField(Enrichment.ExcludedCol, StringType, nullable = false))
    val outSchema =
      if (correction)
        StructType(enrichedFields.map(f => StructField(f.name, StringType, nullable = true)))
      else StructType(enrichedFields)
    val fieldNames = enrichedFields.map(_.name).toIndexedSeq

    val brandIdx = inSchema.fieldIndex(brandCol)
    val imageIdx = inSchema.fieldIndex(imageCol)
    val excludedRegex =
      ("(?:^|[^а-я])и\\s*с\\s*к\\s*л\\s*ю\\s*ч\\s*е\\s*н(?:$|[^а-я])").r

    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))

    df.mapPartitions { rows =>
      rows.map { row =>
        val rowText = (0 until row.length)
          .flatMap(i => Option(row.get(i)).map(_.toString)).mkString(" ")
        val normalized = rowText.toLowerCase.replace('ё', 'е')
        val excluded = excludedRegex.findFirstIn(normalized).isDefined

        val brand0 = Option(row.getAs[String](brandIdx)).getOrElse("")
        val image = Option(row.getAs[String](imageIdx)).getOrElse("")

        val enriched: Seq[Any] = if (excluded) {
          // Null brand normalizes to "" here too: the plan form's
          // brand output is coalesce(brand, '') on every branch — found
          // by the EnrichFuzzSpec plan-vs-service differential
          // (excluded ∧ null-brand rows disagreed, "" vs null). The
          // plan form is the oracle-pinned canon; note the reference's
          // excluded path stringifies EVERY cell as str(v or "")
          // (utils/gpt.py:405) — that per-cell normalization is matched
          // here only under correction=true's coalesce-stringify, while
          // non-brand cells in non-correction mode keep their values
          // as-is by design (the plan form does the same).
          row.toSeq.updated(brandIdx, brand0) ++ Seq(null, null, "Да")
        } else {
          val brand1 =
            if (brand0.isEmpty && image.nonEmpty)
              client.recognizeImage(image).map(_ + " (RECOG)").getOrElse(brand0)
            else brand0
          val (en, ru) =
            if (brand1.trim.nonEmpty)
              client.brandSamples(brand1.replace(" (RECOG)", "").trim)
            else (Nil, Nil)
          val enCell = if (brand1.trim.nonEmpty) en.mkString(", ") else null
          val ruCell = if (brand1.trim.nonEmpty) ru.mkString(", ") else null
          row.toSeq.updated(brandIdx, brand1) ++ Seq(enCell, ruCell, "Нет")
        }

        if (!correction) Row.fromSeq(enriched)
        else {
          val asStr = enriched.map(v => Option(v).map(_.toString).getOrElse(""))
          val original = fieldNames.zip(asStr).toMap
          val corrected =
            try client.correctRow(original)
            catch { case scala.util.control.NonFatal(_) => None }
          Row.fromSeq(corrected match {
            // Field-wise fallback: a corrected map missing a column — or
            // carrying an explicit null for it — keeps that column's
            // original value, preserving the all-string/null→"" contract
            // (same per-field coalesce as Enrichment.correctRows).
            case Some(m) =>
              fieldNames.map(n => Option(m.getOrElse(n, null)).getOrElse(original(n)))
            case None => asStr
          })
        }
      }
    }
  }
}
