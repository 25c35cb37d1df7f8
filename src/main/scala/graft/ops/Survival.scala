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

  /** Grouped two-sample log-rank test (Mantel '66) — "do the two arms'
    * survival curves differ?", the hypothesis test that pairs with
    * [[kaplanMeier]]'s estimate exactly as Mann–Kendall pairs with
    * Theil–Sen. At every pooled event time, arm A's observed events
    * compare against the hypergeometric expectation given the shared
    * risk sets:
    *
    *   O  = Σ d_Ai              E = Σ d_i·r_Ai/r_i
    *   V  = Σ d_i·(r_Ai/r_i)·(1−r_Ai/r_i)·(r_i−d_i)/(r_i−1)
    *   z  = (O − E)/√V
    *
    * Every per-time E/V term is ONE exact integral division of exact
    * longs into micro units (`d·r_A·10⁶ div r`, and the V numerator/
    * denominator cleared to one division — all operands non-negative,
    * so truncating div ≡ floor ≡ DuckDB `//`), and the sums are exact —
    * the BM25 quantize-then-sum rule, so the whole test hash-oracles.
    * z is one multiply/sqrt/divide/floor; the two-sided p uses
    * [[graft.ops.Regression.normalPValueMicro]]'s rational CDF.
    * Censored subjects leave the risk set without contributing events —
    * exactly the bias [[kaplanMeier]] corrects.
    *
    * Output: `(group…, n_times, o_a, e_a_micro, v_micro, z_micro,
    * p_micro)`; z/p NULL when V = 0 (an arm empty, or no event time
    * with both arms at risk).
    *
    * Scale: one hash aggregation onto (group, t) cells, suffix-sum
    * windows over the CELL relation (the kaplanMeier shape), then a
    * per-group fold — subjects never cross a window. Bin durations to
    * calendar grain first, as kaplanMeier.
    */
  def logRank(df: DataFrame, groupCols: Seq[String], armCol: String,
      durationCol: String, eventCol: String): DataFrame = {
    require(groupCols.nonEmpty, "logRank needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val cells = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull &&
        col(armCol).isNotNull)
      .select(g ++ Seq(col(durationCol).cast("long").as("t"),
        when(col(armCol), 1L).otherwise(0L).as("_lr_a"),
        when(col(eventCol), 1L).otherwise(0L).as("_lr_e")): _*)
      .groupBy(g :+ col("t"): _*)
      .agg(count(lit(1)).as("_lr_n"), sum(col("_lr_a")).as("_lr_na"),
        sum(col("_lr_e")).as("_lr_d"),
        sum(col("_lr_a") * col("_lr_e")).as("_lr_da"))
    val sfx = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val terms = cells
      .withColumn("_lr_r", sum(col("_lr_n")).over(sfx))
      .withColumn("_lr_ra", sum(col("_lr_na")).over(sfx))
      .filter(col("_lr_d") > 0L)
      .withColumn("_lr_em", expr(
        s"(CAST(_lr_d AS $dec) * _lr_ra * 1000000) div CAST(_lr_r AS $dec)"))
      .withColumn("_lr_vm", when(col("_lr_r") > 1L, expr(
        s"""(CAST(_lr_d AS $dec) * _lr_ra * (_lr_r - _lr_ra)
           | * (_lr_r - _lr_d) * 1000000)
           | div (CAST(_lr_r AS $dec) * _lr_r * (_lr_r - 1))""".stripMargin))
        .otherwise(lit(0L)))
    terms.groupBy(g: _*).agg(
        count(lit(1)).as("n_times"),
        sum(col("_lr_da")).as("o_a"),
        sum(col("_lr_em")).as("e_a_micro"),
        sum(col("_lr_vm")).as("v_micro"))
      .withColumn("z_micro", when(col("v_micro") > 0L,
        floor((col("o_a") * lit(1000000L) - col("e_a_micro")).cast("double") *
          lit(1000.0) / sqrt(col("v_micro").cast("double"))).cast("long")))
      .withColumn("p_micro", when(col("z_micro").isNotNull,
        Regression.normalPValueMicro(col("z_micro"))))
      .select(g ++ Seq(col("n_times"), col("o_a"), col("e_a_micro"),
        col("v_micro"), col("z_micro"), col("p_micro")): _*)
  }
}
