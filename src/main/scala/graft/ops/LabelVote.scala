package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-calibrated weighted label election — the crowd/preference-label
  * aggregation step of an RLHF or classification data pipeline: many
  * raters vote a label per item, a small gold slice measures each
  * rater's accuracy, and every item elects the label with the highest
  * accuracy-weighted vote mass (the one-step, closed-form core of
  * Dawid–Skene-style aggregation — no EM, fully deterministic, fully
  * hash-oracleable).
  *
  * Weights are exact integer micro-units: `(n_correct · 10⁶) div
  * n_gold` per rater (floor division, the house quantization); raters
  * who never voted on a gold item carry the uninformative prior
  * 500 000 (= 0.5). The election is per (item, label) exact weight
  * sums with the deterministic min(struct(−total, label)) rule — max
  * mass, ties to the smallest label.
  *
  * Scale: two hash aggregations (rater accuracy over the gold join —
  * build side |gold|, broadcastable; vote mass per (item, label)) and
  * one broadcast-sized rater-weight relation joined onto the vote
  * stream. The election is an aggregation, never a window over raw
  * votes. No iteration: full Dawid–Skene EM trades determinism for
  * marginal accuracy and its per-iteration shape is this same pair of
  * aggregations — this operator IS one EM half-step with gold-anchored
  * confusion mass.
  */
object LabelVote {

  /** `votes(item, rater, label)` + `gold(item, label)` →
    * `(item, label, weight_micro, n_votes, n_labels)`: the elected
    * label per voted item with its winning weight mass, vote count,
    * and the number of distinct labels proposed.
    */
  def weightedVote(votes: DataFrame, gold: DataFrame): DataFrame = {
    val v = votes.select(col("item"), col("rater"), col("label"))
      .filter(col("item").isNotNull && col("rater").isNotNull &&
        col("label").isNotNull)
    val g = gold.select(col("item").as("_lv_item"),
      col("label").as("_lv_gold"))

    val weights = v
      .join(g, col("item") === col("_lv_item"))
      .groupBy(col("rater"))
      .agg(count(lit(1)).as("_lv_n"),
        sum(when(col("label") === col("_lv_gold"), 1L).otherwise(0L))
          .as("_lv_ok"))
      .select(col("rater"),
        expr("(_lv_ok * 1000000) div _lv_n").as("_lv_w"))

    val mass = v
      .join(broadcast(weights), Seq("rater"), "left")
      .withColumn("_lv_w", coalesce(col("_lv_w"), lit(500000L)))
      .groupBy(col("item"), col("label"))
      .agg(sum(col("_lv_w")).as("_lv_mass"), count(lit(1)).as("_lv_votes"))

    mass.groupBy(col("item"))
      .agg(
        min(struct((-col("_lv_mass")).as("m"), col("label").as("l")))
          .as("_lv_win"),
        sum(col("_lv_votes")).as("n_votes"),
        count(lit(1)).as("n_labels"))
      .select(col("item"), col("_lv_win.l").as("label"),
        (-col("_lv_win.m")).as("weight_micro"),
        col("n_votes"), col("n_labels"))
  }
}
