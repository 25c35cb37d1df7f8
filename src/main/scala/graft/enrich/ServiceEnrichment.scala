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
}

/** Deterministic offline double, keyed by input content — stands in for the
  * remote model in tests (FIXTURES.md §B.8).
  */
class StubLlmClient extends LlmClient {
  override def recognizeImage(imagePayload: String): Option[String] =
    if (imagePayload.isEmpty) None
    else Some("OCR-" + Integer.toHexString(imagePayload.hashCode))

  override def brandSamples(prompt: String): (Seq[String], Seq[String]) =
    (Seq(prompt.toUpperCase, prompt.toLowerCase), Seq(prompt + "-ру"))
}

object ServiceEnrichment {

  /** Same decision tree as [[Enrichment.process]], but with the effectful
    * steps executed per partition against `client`.
    */
  def process(
      df: DataFrame,
      brandCol: String,
      imageCol: String,
      client: LlmClient): DataFrame = {

    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField(Enrichment.EnglishCol, StringType, nullable = true),
      StructField(Enrichment.RussianCol, StringType, nullable = true),
      StructField(Enrichment.ExcludedCol, StringType, nullable = false)))

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

        if (excluded) {
          Row.fromSeq(row.toSeq ++ Seq(null, null, "Да"))
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
          Row.fromSeq(row.toSeq.updated(brandIdx, brand1) ++ Seq(enCell, ruCell, "Нет"))
        }
      }
    }
  }
}
