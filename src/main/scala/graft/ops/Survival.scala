package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event analysis under right-censoring — the retention shape
  * [[EventOps]]'s cohort table cannot express: subjects still alive at
  * observation end are CENSORED (they contribute at-risk time without
  * an event), and naive "fraction converted by day t" is biased exactly
  * by that censoring. Kaplan–Meier is the standard nonparametric
  * estimator (Kaplan & Meier '58); in a data-engine setting it reads on
  * anything with a duration and an observed/censored flag — time to
  * order fulfilment, time to churn, time to first dedup-cluster merge.
  */
object Survival {

  /** Grouped Kaplan–Meier estimate over integer durations. For each
    * group and each distinct duration t (ascending), reports
    *
    *   `(groupCols*, t, at_risk, events, censored, km_log_micro)`
    *
    * where `at_risk` = subjects with duration ≥ t, `events` = observed
    * events at exactly t, and `km_log_micro` is the LOG of the survival
    * estimate in integer micro-nats:
    *
    *   ln Ŝ(t) = Σ_{u ≤ t} ln((at_risk_u − events_u) / at_risk_u)
    *
    * The log form is deliberate: each factor's ln lands on the corpus
    * micro-nat rule (`round(ln·10⁶)` of ONE IEEE division of exact
    * longs — the [[graft.text.TextAnalysis.lmBigramScore]] quantization,
    * verified hash-stable cross-engine), and the running product becomes
    * an EXACT integer prefix sum — no engine-ordered float accumulation,
    * no libm exp on the read side. Ŝ itself is exp(km_log_micro/10⁶)
    * for display; ln Ŝ is monotone in Ŝ so thresholding/comparison
    * semantics are unchanged. Once a time step kills every remaining
    * subject (events = at_risk, Ŝ hits exactly 0, ln = −∞) that row and
    * all later rows report NULL `km_log_micro` — the flag propagates
    * via a prefix max, not via SQL sum's null-skipping.
    *
    * Callers bin durations to a calendar grain (days/weeks) first: the
    * output and the window run over DISTINCT (group, t) cells, so the
    * cell count — not the subject count — must stay bounded.
    *
    * Scale: ONE hash aggregation onto (group, t) cells with map-side
    * partials (exact longs), then two prefix windows over the cell
    * relation sharing one (group, t) sort. At-risk counts come from a
    * suffix sum over the same cells — never a per-subject window.
    */
  def kaplanMeier(df: DataFrame, groupCols: Seq[String],
      durationCol: String, eventCol: String): DataFrame = {
    require(groupCols.nonEmpty, "kaplanMeier needs group columns")
    val g = groupCols.map(col)
    val cells = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(g ++ Seq(col(durationCol).cast("long").as("t"),
        when(col(eventCol), 1L).otherwise(0L).as("_km_e")): _*)
      .groupBy(g :+ col("t"): _*)
      .agg(count(lit(1)).as("_km_n"), sum(col("_km_e")).as("events"))
    val asc = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sfx = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cells
      .withColumn("at_risk", sum(col("_km_n")).over(sfx))
      // per-step factor ln((r − d)/r) on the corpus micro-nat rule;
      // d = 0 steps contribute an exact 0 without touching libm
      .withColumn("_km_term",
        when(col("events") === 0L, lit(0L))
          .when(col("events") < col("at_risk"),
            round(log((col("at_risk") - col("events")).cast("double") /
              col("at_risk").cast("double")) * 1e6).cast("long")))
      .withColumn("_km_dead",
        max(when(col("events") === col("at_risk"), 1L).otherwise(0L))
          .over(asc))
      .withColumn("km_log_micro",
        when(col("_km_dead") === 0L, sum(col("_km_term")).over(asc)))
      .select(g ++ Seq(col("t"), col("at_risk"), col("events"),
        (col("_km_n") - col("events")).as("censored"),
        col("km_log_micro")): _*)
  }
}
