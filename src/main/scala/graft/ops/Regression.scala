package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass grouped ordinary-least-squares trend fitting — the "is this
  * metric drifting?" primitive (corpus quality over crawl date, revenue
  * over time per segment). Closed-form slope/intercept from the five
  * classic power sums, so the whole fit is ONE hash aggregation with
  * map-side partials — no iteration, no per-group value buffering (the
  * shape exact percentiles cannot achieve).
  */
object Regression {

  /** Per-group OLS fit of `yCol` against `xCol`. Returns one row per
    * group: `(groupCols*, n, slope_micro, intercept_micro, mean_y_micro)`
    * where slope/intercept/mean are reported in integer 10⁻⁶ y-units
    * (slope per one x-unit). Rows with a NULL x or y are ignored; groups
    * whose x has zero variance (n = 1, or all x equal) report NULL
    * slope/intercept (the fit is undefined) with the mean still defined.
    *
    * Deterministic cross-engine by exact arithmetic end-to-end: x must be
    * integer-valued (cast to long; the caller projects e.g. a datediff),
    * y is quantized to 10⁻⁴ units, power sums accumulate in decimal(38,0)
    * (exact like DuckDB's HUGEINT — float sums are order-dependent,
    * decimal sums are not), and each reported value is one integral
    * division (`div`), which truncates toward zero in BOTH engines
    * (-7 div 2 = -3; DuckDB's `//` agrees — tested, and the negative-slope
    * spec pins it).
    *
    * Scale: a pure partial-aggregable groupBy — the five sums combine
    * associatively, so 100 TB costs one shuffle of |groups| rows. The
    * decimal(38,0) headroom holds to ~10¹² rows per group at price-scale
    * magnitudes (n·sxy ≲ 10³⁸); quantize coarser if x·y exceeds that.
    */
  def linearTrend(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "linearTrend needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(g ++ Seq(
        col(xCol).cast("long").cast(dec).as("_rg_x"),
        round(col(yCol) * 10000).cast("long").cast(dec).as("_rg_y")): _*)
    rows.groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("_rg_x")).as("_rg_sx"),
        sum(col("_rg_y")).as("_rg_sy"),
        sum(col("_rg_x") * col("_rg_x")).as("_rg_sxx"),
        sum(col("_rg_x") * col("_rg_y")).as("_rg_sxy"))
      .withColumn("_rg_num",
        col("n").cast(dec) * col("_rg_sxy") - col("_rg_sx") * col("_rg_sy"))
      .withColumn("_rg_den",
        col("n").cast(dec) * col("_rg_sxx") - col("_rg_sx") * col("_rg_sx"))
      .select((g ++ Seq(col("n"),
        when(col("_rg_den") > 0, expr("(_rg_num * 100) div _rg_den"))
          .as("slope_micro"),
        when(col("_rg_den") > 0,
          expr("((_rg_sy * _rg_den - _rg_num * _rg_sx) * 100) div (n * _rg_den)"))
          .as("intercept_micro"),
        expr("(_rg_sy * 100) div n").as("mean_y_micro"))): _*)
  }

  /** Welch's unequal-variance t-test per group — the A/B decision
    * primitive (did the new filter change quality? does arm B differ?).
    * One row per group with per-arm counts/means, the t statistic, and
    * the Welch–Satterthwaite degrees of freedom, all in floored integer
    * micro-units.
    *
    * Deterministic cross-engine because every aggregate SUM is exact
    * (y quantized to 10⁻⁴ longs, sums in decimal(38,0) — order-free
    * where float sums are not) and everything after is ONE fixed
    * expression tree of IEEE-defined ops (multiply/divide/sqrt are
    * correctly rounded; only engine-ordered float accumulation and libm
    * pow/ln can differ, and neither appears here). `armCol` must be
    * boolean (true = arm A). Groups needing guards: an arm with n < 2
    * has no variance estimate, and zero pooled standard error (both
    * arms constant) has no t — both report NULL t/df.
    *
    * Scale: ONE hash aggregation with map-side partials (conditional
    * sums per arm), then a |groups|-row projection. Same shape as
    * [[linearTrend]] — no value buffering, no window, no second pass.
    */
  def welchTTest(df: DataFrame, groupCols: Seq[String], armCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "welchTTest needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    // floor(), not round(): round of a COMPUTED double is the one
    // documented cross-engine hazard (NOTES, the lm_score lesson);
    // floor of the bit-identical product is stable everywhere. y here
    // is typically a measurement — the 10⁻⁴ quantization bias is part
    // of the operator's definition, not an approximation of round.
    val rows = df.filter(col(yCol).isNotNull && col(armCol).isNotNull)
      .select(g ++ Seq(col(armCol).as("_ab_a"),
        floor(col(yCol) * 10000).cast("long").cast(dec).as("_ab_y")): _*)
    def armSum(arm: Boolean, e: org.apache.spark.sql.Column) =
      sum(when(col("_ab_a") === arm, e).otherwise(lit(0).cast(dec)))
    val agg = rows.groupBy(g: _*).agg(
      sum(when(col("_ab_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_ab_a"), 1L).otherwise(0L)).as("n_b"),
      armSum(true, col("_ab_y")).as("_s_a"),
      armSum(false, col("_ab_y")).as("_s_b"),
      armSum(true, col("_ab_y") * col("_ab_y")).as("_ss_a"),
      armSum(false, col("_ab_y") * col("_ab_y")).as("_ss_b"))
    // fixed IEEE expression tree from exact ingredients (1e-4 y-units)
    def d(c: String) = col(c).cast("double")
    val mA = d("_s_a") / d("n_a"); val mB = d("_s_b") / d("n_b")
    val vA = (d("_ss_a") - d("_s_a") * d("_s_a") / d("n_a")) / (d("n_a") - 1.0)
    val vB = (d("_ss_b") - d("_s_b") * d("_s_b") / d("n_b")) / (d("n_b") - 1.0)
    val seA = vA / d("n_a"); val seB = vB / d("n_b")
    val se2 = seA + seB
    val tOk = col("n_a") >= 2L && col("n_b") >= 2L && se2 > 0.0
    agg.select((g ++ Seq(col("n_a"), col("n_b"),
      when(col("n_a") > 0L, floor(mA * 100.0).cast("long")).as("mean_a_micro"),
      when(col("n_b") > 0L, floor(mB * 100.0).cast("long")).as("mean_b_micro"),
      when(tOk, floor((mA - mB) / sqrt(se2) * 1000000.0).cast("long"))
        .as("t_micro"),
      when(tOk, floor(se2 * se2 /
          (seA * seA / (d("n_a") - 1.0) + seB * seB / (d("n_b") - 1.0))
        * 1000000.0).cast("long")).as("df_micro"))): _*)
  }

  /** Two-proportion pooled z-test per group — the conversion-rate A/B
    * decision (did arm B's success rate move?). Counts are exact longs;
    * the z statistic is one fixed IEEE expression tree (the welchTTest
    * argument), reported with the per-arm rates in floored micro-units.
    * `armCol` and `successCol` must be boolean; rows with either NULL
    * are ignored. An empty arm or a degenerate pooled rate (all success
    * or all failure — zero standard error) reports NULL z.
    *
    * Scale: ONE conditional-count hash aggregation, |groups| rows out.
    */
  def proportionZTest(df: DataFrame, groupCols: Seq[String], armCol: String,
      successCol: String): DataFrame = {
    require(groupCols.nonEmpty, "proportionZTest needs group columns")
    val g = groupCols.map(col)
    val rows = df.filter(col(armCol).isNotNull && col(successCol).isNotNull)
      .select(g ++ Seq(col(armCol).as("_pz_a"),
        col(successCol).as("_pz_s")): _*)
    def cnt(p: org.apache.spark.sql.Column) =
      sum(when(p, 1L).otherwise(0L))
    val agg = rows.groupBy(g: _*).agg(
      cnt(col("_pz_a")).as("n_a"),
      cnt(col("_pz_a") && col("_pz_s")).as("x_a"),
      cnt(!col("_pz_a")).as("n_b"),
      cnt(!col("_pz_a") && col("_pz_s")).as("x_b"))
    def d(c: String) = col(c).cast("double")
    val pA = d("x_a") / d("n_a"); val pB = d("x_b") / d("n_b")
    val pPool = (d("x_a") + d("x_b")) / (d("n_a") + d("n_b"))
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / d("n_a") + lit(1.0) / d("n_b")))
    val ok = col("n_a") > 0L && col("n_b") > 0L && se > 0.0
    agg.select((g ++ Seq(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      when(col("n_a") > 0L, floor(pA * 1000000.0).cast("long")).as("p_a_micro"),
      when(col("n_b") > 0L, floor(pB * 1000000.0).cast("long")).as("p_b_micro"),
      when(ok, floor((pA - pB) / se * 1000000.0).cast("long")).as("z_micro"))): _*)
  }

  /** Mann–Whitney U per group — the rank-based (distribution-free) A/B
    * test that survives the heavy tails and outliers Welch's t inherits
    * from the mean. Doubled mid-ranks keep everything integer:
    * `2·midrank = 2·rank_min + tieCount − 1` (exact longs — summing
    * half-integer mid-ranks in floats would be order-dependent), so
    * `2·U_A = 2·n_A·n_B + n_A(n_A+1) − Σ_A 2·midrank` is exact, reported
    * as `u2_a`. The normal approximation applies the standard tie
    * correction — `σ² = n_A n_B/12 · ((n+1) − Σ(t³−t)/(n(n−1)))` with
    * `Σ(t³−t)` an exact decimal sum over tie-group sizes — and the z
    * statistic is one fixed IEEE expression tree (the welchTTest
    * argument). Ties are defined on the 10⁻⁴-quantized values
    * (definitional, same floor() rationale as welchTTest). Guards: an
    * empty arm or an all-tied group (σ = 0) reports NULL z.
    *
    * Scale: ONE full-data pass — a hash aggregation (map-side partials)
    * onto the distinct (group, quantized-value) cells with per-arm
    * counts; ranks are recovered from a running sum over that CELL
    * relation (`2·midrank = 2·cumBefore + t + 1`, so
    * `Σ_A 2·midrank = Σ_v a_v·(2·cumBefore(v) + t_v + 1)` exactly), and
    * the tie correction is `Σ_v (t³−t)` over the same cells. The raw
    * rows are never sorted — the only sort is the per-group cell window,
    * |distinct values| rows, not |rows|. Same skew story as any grouped
    * aggregation (AQE splits).
    */
  def mannWhitney(df: DataFrame, groupCols: Seq[String], armCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "mannWhitney needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val rows = df.filter(col(yCol).isNotNull && col(armCol).isNotNull)
      .select(g ++ Seq(col(armCol).as("_mw_a"),
        floor(col(yCol) * 10000).cast("long").as("_mw_y")): _*)
    val cells = rows
      .groupBy(g :+ col("_mw_y"): _*)
      .agg(sum(when(col("_mw_a"), 1L).otherwise(0L)).as("_mw_av"),
        sum(when(!col("_mw_a"), 1L).otherwise(0L)).as("_mw_bv"))
      .withColumn("_mw_t", col("_mw_av") + col("_mw_bv"))
    // Rows strictly below this value in the group — rank_min(v) − 1.
    val wCum = Window.partitionBy(g: _*).orderBy(col("_mw_y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = cells.withColumn("_mw_cum",
      coalesce(sum(col("_mw_t")).over(wCum), lit(0L)))
    // Per-row doubled midrank in tie group v is 2·rank_min + t − 1
    //   = 2·(cumBefore+1) + t − 1 = 2·cumBefore + t + 1, constant within
    // the group, so arm A's doubled-rank sum is a_v × that — decimal
    // factors keep t·n and t³ exact past the long range.
    val agg = cum.groupBy(g: _*).agg(
      sum(col("_mw_av")).as("n_a"),
      sum(col("_mw_bv")).as("n_b"),
      sum(col("_mw_av").cast(dec) *
        (lit(2L) * col("_mw_cum") + col("_mw_t") + lit(1L)).cast(dec))
        .as("_mw_ra2"),
      sum(col("_mw_t").cast(dec) * col("_mw_t").cast(dec) *
          col("_mw_t").cast(dec) - col("_mw_t").cast(dec))
        .as("_mw_ties"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val n = col("n_a") + col("n_b")
    val u2a = (lit(2L).cast(dec) * col("n_a").cast(dec) * col("n_b").cast(dec) +
      col("n_a").cast(dec) * (col("n_a").cast(dec) + lit(1L).cast(dec)) -
      col("_mw_ra2"))
    val sigma = sqrt(d(col("n_a")) * d(col("n_b")) / lit(12.0) *
      ((d(n) + 1.0) - d(col("_mw_ties")) / (d(n) * (d(n) - 1.0))))
    val zOk = col("n_a") > 0L && col("n_b") > 0L && sigma > 0.0
    agg
      .withColumn("u2_a", u2a.cast("long"))
      .select((g ++ Seq(col("n_a"), col("n_b"), col("u2_a"),
        when(zOk, floor(
          (d(col("u2_a")) - d(col("n_a")) * d(col("n_b"))) / 2.0 / sigma
          * 1000000.0).cast("long")).as("z_micro"))): _*)
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * labelers of the same rows (quality raters, weak classifiers, dedup
    * judges): `κ = (p_o − p_e) / (1 − p_e)` with observed agreement
    * `p_o = agree/n` and chance agreement `p_e = Σ_c n^A_c·n^B_c / n²`.
    * Clearing denominators keeps everything integer until the very end:
    * `κ = (agree·n − Σ_c n^A_c·n^B_c) / (n² − Σ_c n^A_c·n^B_c)` — exact
    * decimal numerator/denominator, ONE double division, reported as
    * floored `kappa_micro`. Degenerate groups (both raters constant →
    * p_e = 1, or empty) report NULL.
    *
    * Scale: one hash shuffle of the raw rows onto (group, a, b) cells;
    * everything after operates on the |labels|²-sized cell relation
    * (two re-aggregations + an equi-join on the label value) — tiny
    * regardless of corpus size, with map-side partials on the only
    * full-data pass.
    */
  def cohenKappa(df: DataFrame, groupCols: Seq[String], raterACol: String,
      raterBCol: String): DataFrame = {
    require(groupCols.nonEmpty, "cohenKappa needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    // Lazy persist (lineage kept, same contract as Dedup's frames): the
    // cell relation feeds THREE aggregations — without it each branch
    // re-scans and re-shuffles the raw table.
    val cells = df
      .filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .groupBy(g :+ col(raterACol).as("_ck_a") :+ col(raterBCol).as("_ck_b"): _*)
      .agg(count(lit(1)).as("_ck_c"))
      .persist()
    val totals = cells.groupBy(g: _*).agg(
      sum(col("_ck_c")).cast(dec).as("_ck_n"),
      sum(when(col("_ck_a") === col("_ck_b"), col("_ck_c")).otherwise(0L))
        .cast(dec).as("_ck_agree"))
    val margA = cells.groupBy(g :+ col("_ck_a").as("_ck_cat"): _*)
      .agg(sum(col("_ck_c")).cast(dec).as("_ck_na"))
    val margB = cells.groupBy(g :+ col("_ck_b").as("_ck_cat"): _*)
      .agg(sum(col("_ck_c")).cast(dec).as("_ck_nb"))
    val e = margA.join(margB, groupCols :+ "_ck_cat")
      .groupBy(g: _*).agg(sum(col("_ck_na") * col("_ck_nb")).as("_ck_e"))
    val num = col("_ck_agree") * col("_ck_n") - col("_ck_e")
    val den = col("_ck_n") * col("_ck_n") - col("_ck_e")
    totals.join(e, groupCols)
      .select(g ++ Seq(
        col("_ck_n").cast("long").as("n"),
        col("_ck_agree").cast("long").as("agree"),
        when(den =!= lit(0).cast(dec),
          floor(num.cast("double") / den.cast("double") * 1000000.0)
            .cast("long")).as("kappa_micro")): _*)
  }

  /** Per-class precision / recall / F1 from a confusion-cell relation —
    * the quality-classifier evaluation primitive (how well does the
    * fastText-shape gate reproduce the human labels per language?). One
    * row per (group, label) over the UNION of actual and predicted
    * label sets, so a class the model never predicts still reports its
    * (zero) recall and a hallucinated class still reports its (zero)
    * precision. Everything is exact integer arithmetic: counts are
    * longs and each metric is ONE integral division —
    * `precision = tp·10⁶ div n_predicted`,
    * `recall = tp·10⁶ div n_actual`,
    * `f1 = 2·tp·10⁶ div (n_predicted + n_actual)` (the harmonic mean
    * identity with cleared denominators — no doubles anywhere, so the
    * DuckDB oracle is bit-trivial). A label absent from a side reports
    * NULL for the metric whose denominator vanishes.
    *
    * Scale: one hash shuffle of the raw rows onto (group, actual,
    * predicted) cells with map-side partials; the two margin
    * re-aggregations and the label-frame outer join run on the
    * |labels|²-bounded cell relation, never the data.
    */
  def confusionStats(df: DataFrame, groupCols: Seq[String], actualCol: String,
      predictedCol: String): DataFrame = {
    require(groupCols.nonEmpty, "confusionStats needs group columns")
    val g = groupCols.map(col)
    // Lazy persist (the cohenKappa contract): the cell relation feeds
    // the diagonal and both margins.
    val cells = df
      .filter(col(actualCol).isNotNull && col(predictedCol).isNotNull)
      .groupBy(g :+ col(actualCol).as("_cf_a") :+ col(predictedCol).as("_cf_p"): _*)
      .agg(count(lit(1)).as("_cf_c"))
      .persist()
    val actual = cells.groupBy(g :+ col("_cf_a").as("label"): _*)
      .agg(sum(col("_cf_c")).as("n_actual"))
    val predicted = cells.groupBy(g :+ col("_cf_p").as("label"): _*)
      .agg(sum(col("_cf_c")).as("n_predicted"))
    val tp = cells.filter(col("_cf_a") === col("_cf_p"))
      .groupBy(g :+ col("_cf_a").as("label"): _*)
      .agg(sum(col("_cf_c")).as("_cf_tp"))
    val keys = groupCols :+ "label"
    actual.join(predicted, keys, "full_outer")
      .join(tp, keys, "left")
      .na.fill(0L, Seq("n_actual", "n_predicted", "_cf_tp"))
      .select(g ++ Seq(col("label"), col("n_actual"), col("n_predicted"),
        col("_cf_tp").as("tp"),
        when(col("n_predicted") > 0L,
          expr("(cast(tp as decimal(38,0)) * 1000000) div n_predicted"))
          .as("precision_micro"),
        when(col("n_actual") > 0L,
          expr("(cast(tp as decimal(38,0)) * 1000000) div n_actual"))
          .as("recall_micro"),
        when(col("n_predicted") + col("n_actual") > 0L,
          expr("(2 * cast(tp as decimal(38,0)) * 1000000)" +
            " div (n_predicted + n_actual)"))
          .as("f1_micro")): _*)
  }

  /** ROC AUC per group via the rank identity — the threshold-free
    * scorer evaluation (does the quality score actually order kept
    * documents above dropped ones?). `AUC = U⁺ / (n⁺·n⁻)` with
    * `U⁺ = R⁺ − n⁺(n⁺+1)/2` over ascending mid-ranks of the score, so
    * this is [[mannWhitney]]'s machinery pointed at a boolean label:
    * doubled mid-ranks keep every sum an exact integer, and
    * `auc_micro = (2·U⁺)·10⁶ div (2·n⁺·n⁻)` is ONE integral division —
    * ties credit half by construction, no doubles anywhere, fully
    * hash-oracled. Groups with an empty side report NULL auc.
    *
    * Scale: one hash shuffle on the group key serves the rank window,
    * the tie window, and the final aggregation (the mannWhitney shape);
    * per-group state is the sort, AQE splits skewed groups.
    */
  def rocAuc(df: DataFrame, groupCols: Seq[String], labelCol: String,
      scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "rocAuc needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val rows = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(g ++ Seq(col(labelCol).as("_rc_l"),
        floor(col(scoreCol) * 10000).cast("long").as("_rc_s")): _*)
    val rk = rank().over(Window.partitionBy(g: _*).orderBy(col("_rc_s")))
    val tie = count(lit(1)).over(Window.partitionBy(g :+ col("_rc_s"): _*))
    val agg = rows
      .withColumn("_rc_r2", lit(2L) * rk + tie - lit(1L))
      .groupBy(g: _*).agg(
        sum(when(col("_rc_l"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("_rc_l"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("_rc_l"), col("_rc_r2")).otherwise(lit(0L)).cast(dec))
          .as("_rc_rp2"))
    val u2 = col("_rc_rp2") -
      col("n_pos").cast(dec) * (col("n_pos").cast(dec) + lit(1L).cast(dec))
    agg
      .withColumn("_rc_u2", u2)
      .withColumn("u2_pos", col("_rc_u2").cast("long"))
      .select(g ++ Seq(col("n_pos"), col("n_neg"), col("u2_pos"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          // decimal operands: u2·10⁶ overflows long already at
          // n ≈ 2·10⁹ rows per group
          expr("(_rc_u2 * 1000000) div " +
            "(2 * cast(n_pos as decimal(38,0)) * n_neg)"))
          .as("auc_micro")): _*)
  }

  /** Reliability (calibration) bins + expected calibration error per
    * group — does "score 0.9" actually mean 90% positive? Scores in
    * [0, 1] land in `nBins` equi-width bins (1.0 clamps into the top
    * bin); each bin reports its size, mean confidence, and observed
    * positive rate, and every row carries the group-level
    * `ece_micro = Σ_b n_b·|acc_b − conf_b| div N` (Naeini '15 / Guo
    * '17). Deterministic end-to-end in integers: scores quantize to
    * 10⁻⁶ longs BEFORE summing (exact long sums — the only place a
    * float accumulation could creep in), both per-bin means are
    * integral divisions, the |gap| is long arithmetic, and the ECE
    * numerator re-accumulates exactly. Empty groups cannot appear;
    * empty bins are simply absent (they contribute 0 to ECE either
    * way).
    *
    * Scale: one hash shuffle onto (group, bin) cells with map-side
    * partials; the ECE window runs over the ≤nBins cell relation.
    */
  def calibrationReport(df: DataFrame, groupCols: Seq[String],
      scoreCol: String, labelCol: String, nBins: Int): DataFrame = {
    require(groupCols.nonEmpty, "calibrationReport needs group columns")
    require(nBins > 0, "calibrationReport needs positive nBins")
    val g = groupCols.map(col)
    val bin = least(greatest(floor(col(scoreCol) * nBins), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    val cells = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(g ++ Seq(bin.as("bin"),
        floor(col(scoreCol) * 1000000).cast("long").as("_cl_s"),
        when(col(labelCol), 1L).otherwise(0L).as("_cl_y")): _*)
      .groupBy(g :+ col("bin"): _*)
      // decimal sums: 10⁶-scale scores over 10¹² rows pass long range
      .agg(count(lit(1)).as("n"),
        sum(col("_cl_s").cast("decimal(38,0)")).as("_cl_ss"),
        sum(col("_cl_y").cast("decimal(38,0)")).as("_cl_pos"))
      .withColumn("conf_micro", expr("_cl_ss div n"))
      .withColumn("acc_micro", expr("(_cl_pos * 1000000) div n"))
    val gw = Window.partitionBy(g: _*)
    cells
      .withColumn("_cl_gap",
        abs(col("acc_micro") - col("conf_micro")).cast("decimal(38,0)")
          * col("n"))
      .withColumn("_cl_gapsum", sum(col("_cl_gap")).over(gw))
      .withColumn("_cl_ntot", sum(col("n")).over(gw))
      .withColumn("ece_micro", expr("_cl_gapsum div _cl_ntot"))
      .select(g ++ Seq(col("bin"), col("n"), col("conf_micro"),
        col("acc_micro"), col("ece_micro")): _*)
  }

  /** Precision–recall curve over binned thresholds: scores in [0, 1]
    * land in `nBins` equi-width bins (1.0 clamps into the top bin) and
    * each OCCUPIED bin t reports the operating point "predict positive
    * iff score-bin ≥ t" — tp/fp/fn plus precision, recall, and F1 in
    * micro units. The classifier-threshold companion to [[rocAuc]]
    * (which integrates the whole curve into one scalar) and
    * [[confusionStats]] (one fixed threshold): this is the relation a
    * threshold gets CHOSEN from. Binning keeps the output ≤nBins rows
    * per group no matter the data size — per-distinct-score sweeps
    * scale output with |rows|, which is exactly what a 100 TB curve
    * cannot do.
    *
    * Deterministic end-to-end in integers: bin counts are exact longs,
    * the cumulative tp/fp are suffix sums over the ≤nBins cell
    * relation, and all three metrics are single integral `div`s
    * (F1 = 2·tp·10⁶ div (2·tp + fp + fn) — the harmonic mean cleared to
    * one quotient). Precision's denominator is always > 0 (bin t itself
    * is occupied); recall NULLs when the group has no positives.
    *
    * Scale: one hash shuffle onto (group, bin) cells with map-side
    * partials; both windows run over the reduced cell relation and
    * share one (group, bin DESC) sort.
    */
  def prCurve(df: DataFrame, groupCols: Seq[String], labelCol: String,
      scoreCol: String, nBins: Int): DataFrame = {
    require(groupCols.nonEmpty, "prCurve needs group columns")
    require(nBins > 0, "prCurve needs positive nBins")
    val g = groupCols.map(col)
    val bin = least(greatest(floor(col(scoreCol) * nBins), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    val cells = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(g ++ Seq(bin.as("thr_bin"),
        when(col(labelCol), 1L).otherwise(0L).as("_pr_y")): _*)
      .groupBy(g :+ col("thr_bin"): _*)
      .agg(count(lit(1)).as("_pr_n"), sum(col("_pr_y")).as("_pr_pos"))
    val gw = Window.partitionBy(g: _*)
    // suffix sums: predict-positive set at threshold t = bins ≥ t
    val sfx = gw.orderBy(col("thr_bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("tp", sum(col("_pr_pos")).over(sfx))
      .withColumn("fp", sum(col("_pr_n") - col("_pr_pos")).over(sfx))
      .withColumn("fn", sum(col("_pr_pos")).over(gw) - col("tp"))
      .select(g ++ Seq(col("thr_bin"), col("tp"), col("fp"), col("fn"),
        expr("tp * 1000000 div (tp + fp)").as("precision_micro"),
        when(col("tp") + col("fn") > 0L,
          expr("tp * 1000000 div (tp + fn)")).as("recall_micro"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
          expr("2 * tp * 1000000 div (2 * tp + fp + fn)")).as("f1_micro")): _*)
  }

  /** CUPED variance-reduced A/B comparison (Deng et al. WSDM'13) — the
    * experiment readout that subtracts what a pre-experiment covariate
    * already predicted: `y_adj = y − θ·(x − x̄)` with
    * `θ = cov(x, y)/var(x)` fitted on BOTH arms pooled (arm-blind, so
    * the adjustment is unbiased under randomization). Reports per-arm
    * counts, the raw mean difference, the adjusted difference
    * `Δ_adj = Δ_y − θ·Δ_x`, and the variance-reduction factor
    * `ρ² = cov²/(var_x·var_y)` — the fraction of metric variance the
    * covariate removes. Deterministic by the [[welchTTest]] argument:
    * x and y quantize to 10⁻⁴ longs, ALL power sums (pooled and
    * per-arm) accumulate in decimal(38,0) in ONE aggregation pass, and
    * every reported value is a fixed IEEE expression tree over those
    * exact ingredients (casts, one division per factor — no
    * engine-ordered float accumulation, no libm). Zero-variance x (or
    * a group with n < 2) reports NULL θ/adjusted/ρ² with the raw
    * difference still defined; ρ² of a constant y likewise NULLs.
    *
    * Scale: ONE hash aggregation with map-side partials — ten
    * conditional power sums, |groups| rows out, no second pass, no
    * window. The decimal headroom argument from [[linearTrend]]
    * applies (n·Sxy ≲ 10³⁸).
    */
  def cuped(df: DataFrame, groupCols: Seq[String], armCol: String,
      yCol: String, xCol: String): DataFrame = {
    require(groupCols.nonEmpty, "cuped needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val rows = df
      .filter(col(armCol).isNotNull && col(yCol).isNotNull &&
        col(xCol).isNotNull)
      .select(g ++ Seq(col(armCol).as("_cu_a"),
        floor(col(yCol) * 10000).cast("long").cast(dec).as("_cu_y"),
        floor(col(xCol) * 10000).cast("long").cast(dec).as("_cu_x")): _*)
    def armSum(arm: Boolean, e: org.apache.spark.sql.Column) =
      sum(when(col("_cu_a") === arm, e).otherwise(lit(0).cast(dec)))
    val agg = rows.groupBy(g: _*).agg(
      sum(when(col("_cu_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_cu_a"), 1L).otherwise(0L)).as("n_b"),
      sum(col("_cu_x")).as("_cu_sx"), sum(col("_cu_y")).as("_cu_sy"),
      sum(col("_cu_x") * col("_cu_x")).as("_cu_sxx"),
      sum(col("_cu_x") * col("_cu_y")).as("_cu_sxy"),
      sum(col("_cu_y") * col("_cu_y")).as("_cu_syy"),
      armSum(true, col("_cu_x")).as("_cu_sxa"),
      armSum(false, col("_cu_x")).as("_cu_sxb"),
      armSum(true, col("_cu_y")).as("_cu_sya"),
      armSum(false, col("_cu_y")).as("_cu_syb"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val n = (col("n_a") + col("n_b")).cast(dec)
    val covNum = n * col("_cu_sxy") - col("_cu_sx") * col("_cu_sy")
    val varXNum = n * col("_cu_sxx") - col("_cu_sx") * col("_cu_sx")
    val varYNum = n * col("_cu_syy") - col("_cu_sy") * col("_cu_sy")
    val theta = d(covNum) / d(varXNum)
    val dY = d(col("_cu_sya")) / d(col("n_a")) -
      d(col("_cu_syb")) / d(col("n_b"))
    val dX = d(col("_cu_sxa")) / d(col("n_a")) -
      d(col("_cu_sxb")) / d(col("n_b"))
    val rho2 = d(covNum) * d(covNum) / (d(varXNum) * d(varYNum))
    val arms = col("n_a") > 0L && col("n_b") > 0L
    val thetaOk = varXNum > lit(0).cast(dec)
    agg.select(g ++ Seq(col("n_a"), col("n_b"),
      when(arms, floor(dY * 100.0).cast("long")).as("diff_micro"),
      when(thetaOk, floor(theta * 1000000.0).cast("long")).as("theta_micro"),
      when(arms && thetaOk, floor((dY - theta * dX) * 100.0).cast("long"))
        .as("adj_diff_micro"),
      when(thetaOk && varYNum > lit(0).cast(dec),
        floor(rho2 * 1000000.0).cast("long")).as("rho2_micro")): _*)
  }

  /** Fleiss' kappa — [[cohenKappa]] generalized from two raters to n:
    * chance-corrected agreement of n categorical ratings per item
    * (n weak labelers over the same documents, n annotators per QA
    * row). Classic Fleiss '71 assumes a CONSTANT rater count, so items
    * whose rating count ≠ `nRaters` are dropped (incomplete/overlapping
    * ratings — reported via the `n_items` column, which counts only the
    * kept items). With per-item category counts `n_ic`:
    * `P̄ = Σ_i Σ_c n_ic(n_ic−1) / (N·n(n−1))`, `p_c = T_c/(N·n)`,
    * `P_e = Σ_c p_c²`, `κ = (P̄ − P_e)/(1 − P_e)`. Clearing
    * denominators keeps every term an exact decimal integer:
    * `κ = (P̄num·(Nn)² − S·D) / (D·((Nn)² − S))` with
    * `P̄num = Σ n_ic(n_ic−1)`, `S = Σ T_c²`, `D = N·n(n−1)` — ONE
    * double division at the end, floored to `kappa_micro`. Degenerate
    * groups (all raters always in one category → P_e = 1, or no
    * complete items) report NULL.
    *
    * Scale: one hash shuffle of the raw ratings onto (group, item,
    * category) cells with map-side partials; the per-item completeness
    * filter, the category totals, and both final aggregations run on
    * that cell relation (≤ items·|categories| rows). Nothing after the
    * first aggregation touches raw data.
    */
  def fleissKappa(df: DataFrame, groupCols: Seq[String], itemCol: String,
      categoryCol: String, nRaters: Int): DataFrame = {
    require(groupCols.nonEmpty, "fleissKappa needs group columns")
    require(nRaters >= 2, "fleissKappa needs at least two raters")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    // Lazy persist (the cohenKappa contract): cells feed the item
    // agreement sums AND the category totals.
    val cells = df
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(g :+ col(itemCol).as("_fk_i") :+ col(categoryCol).as("_fk_c"): _*)
      .agg(count(lit(1)).as("_fk_n"))
      .persist()
    val items = cells.groupBy(g :+ col("_fk_i"): _*)
      .agg(sum(col("_fk_n")).as("_fk_ni"),
        sum(col("_fk_n") * (col("_fk_n") - 1L)).cast(dec).as("_fk_agree"))
      .filter(col("_fk_ni") === nRaters.toLong)
    val perGroup = items.groupBy(g: _*).agg(
      count(lit(1)).as("n_items"),
      sum(col("_fk_agree")).as("_fk_pnum"))
    // category totals over KEPT items only — the semi-join keeps the
    // completeness rule consistent between P̄ and P_e
    val totals = cells
      .join(items.select(g :+ col("_fk_i"): _*), groupCols :+ "_fk_i",
        "left_semi")
      .groupBy(g :+ col("_fk_c"): _*)
      .agg(sum(col("_fk_n")).cast(dec).as("_fk_tc"))
      .groupBy(g: _*)
      .agg(sum(col("_fk_tc") * col("_fk_tc")).as("_fk_s"))
    val n = lit(nRaters.toLong).cast(dec)
    val nn = col("n_items").cast(dec) * n
    val dBar = col("n_items").cast(dec) * n * (n - lit(1L).cast(dec))
    val num = col("_fk_pnum") * nn * nn - col("_fk_s") * dBar
    val den = dBar * (nn * nn - col("_fk_s"))
    perGroup.join(totals, groupCols)
      .select(g ++ Seq(col("n_items"),
        when(col("n_items") > 0L && den =!= lit(0).cast(dec),
          floor(num.cast("double") / den.cast("double") * 1000000.0)
            .cast("long")).as("kappa_micro")): _*)
  }

  /** Chi-square test of independence between two categorical columns per
    * group: `χ² = Σ_cells (observed − expected)² / expected` with
    * `expected = rowTotal·colTotal / N`, plus the classic
    * `(|a|−1)(|b|−1)` degrees of freedom. Observed counts and totals are
    * exact longs; each cell's term is a fixed IEEE expression, and the
    * cell SUM — the one place float addition order could differ — runs
    * as a running window sum in pinned (a, b) order over the cell
    * aggregate, taken at its maximum (terms are non-negative, so the
    * last running value is the max; the aggregate-sum addend order an
    * engine picks never appears).
    *
    * Scale: one (group, a, b) hash aggregation bounds everything
    * downstream at |a|·|b| rows per group; the windows run over that
    * cell relation, never the data.
    */
  def chiSquare(df: DataFrame, groupCols: Seq[String], aCol: String,
      bCol: String): DataFrame = {
    require(groupCols.nonEmpty, "chiSquare needs group columns")
    val g = groupCols.map(col)
    val observed = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy((g :+ col(aCol).as("_cs_a")) :+ col(bCol).as("_cs_b"): _*)
      .agg(count(lit(1)).as("_cs_obs"))
    // densify to the full |a|×|b| grid per group: a ZERO-observed cell
    // still contributes (0−e)²/e — dropping it understates χ² exactly
    // when the dependence is strongest. Expected counts stay positive by
    // construction (every grid value has a nonzero margin).
    val aVals = observed.select(g :+ col("_cs_a"): _*).distinct()
    val bVals = observed.select(g :+ col("_cs_b"): _*).distinct()
    val cells = aVals.join(bVals, groupCols)
      .join(observed, groupCols ++ Seq("_cs_a", "_cs_b"), "left")
      .withColumn("_cs_o", coalesce(col("_cs_obs"), lit(0L)))
    val gw = Window.partitionBy(g: _*)
    val term = {
      val e = (col("_cs_rt").cast("double") * col("_cs_ct").cast("double")) /
        col("_cs_n").cast("double")
      val diff = col("_cs_o").cast("double") - e
      diff * diff / e
    }
    val wOrd = gw.orderBy(col("_cs_a"), col("_cs_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("_cs_rt",
        sum(col("_cs_o")).over(Window.partitionBy(g :+ col("_cs_a"): _*)))
      .withColumn("_cs_ct",
        sum(col("_cs_o")).over(Window.partitionBy(g :+ col("_cs_b"): _*)))
      .withColumn("_cs_n", sum(col("_cs_o")).over(gw))
      .withColumn("_cs_cum", sum(term).over(wOrd))
      .groupBy(g: _*)
      .agg(
        max(col("_cs_cum")).as("_cs_chi"),
        ((size(collect_set(col("_cs_a"))) - 1) *
          (size(collect_set(col("_cs_b"))) - 1)).cast("long").as("dof"))
      .select((g ++ Seq(
        floor(col("_cs_chi") * lit(1000000.0)).cast("long").as("chi2_micro"),
        col("dof"))): _*)
  }

  /** Spearman rank correlation per group — the monotone-association twin
    * of a Pearson pass, robust to outliers and nonlinearity (quality
    * score vs. document length, price vs. quantity): Pearson over
    * average ranks, ties handled by the midrank convention.
    *
    * The determinism trick: DOUBLED midranks are exact integers. A tie
    * run occupying ranks r..r+c−1 has midrank r + (c−1)/2, so
    * 2·midrank = 2·rank() + count(=value) − 1 — both window primitives,
    * no halves. Every moment sum (Σr, Σr², Σrxry) is then an exact
    * long, the numerator n·Σrxry − Σrx·Σry and the two variance terms
    * are exact longs (the shared factor 4 cancels in ρ), and only the
    * final
    *
    *   rho_micro = ⌊num·10⁶ / √(dx·dy)⌋
    *
    * touches floats — long→double conversion, multiply, divide, and
    * IEEE-754 sqrt are all correctly rounded on every engine, so the
    * floored micro value hash-oracles. Long capacity bounds the group
    * size at ~2.5 M rows (n·Σr² < 2⁶³ needs n ≲ 2.5·10⁶); beyond that a
    * group is a population, not a sample — bucket it upstream.
    *
    * Degenerate groups (either variable constant → zero variance) yield
    * null, the welchTTest convention. Scale: two rank windows over the
    * group partitioning plus two tie-count windows, then one hash
    * aggregation; nothing leaves the executors but per-group moment
    * rows.
    */
  def spearmanCorr(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "spearmanCorr needs group columns")
    val g = groupCols.map(col)
    def doubledRank(c: String) =
      (lit(2L) * rank().over(Window.partitionBy(g: _*).orderBy(col(c))) +
        count(lit(1)).over(Window.partitionBy(g :+ col(c): _*)) - lit(1L))
        .cast("long")
    val ranked = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("_sp_rx", doubledRank(xCol))
      .withColumn("_sp_ry", doubledRank(yCol))
    val m = ranked.groupBy(g: _*).agg(
      count(lit(1)).as("n"),
      sum(col("_sp_rx")).as("_sp_sx"),
      sum(col("_sp_ry")).as("_sp_sy"),
      sum(col("_sp_rx") * col("_sp_rx")).as("_sp_sxx"),
      sum(col("_sp_ry") * col("_sp_ry")).as("_sp_syy"),
      sum(col("_sp_rx") * col("_sp_ry")).as("_sp_sxy"))
    val num = (col("n") * col("_sp_sxy") - col("_sp_sx") * col("_sp_sy"))
    val dx = (col("n") * col("_sp_sxx") - col("_sp_sx") * col("_sp_sx"))
    val dy = (col("n") * col("_sp_syy") - col("_sp_sy") * col("_sp_sy"))
    m.select((g ++ Seq(col("n"),
      when(dx > 0L && dy > 0L,
        floor(num.cast("double") * lit(1000000.0) /
          sqrt(dx.cast("double") * dy.cast("double"))).cast("long"))
        .as("rho_micro"))): _*)
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 test + Mantel–Haenszel
    * pooled odds ratio — the confounder-adjusted A/B read
    * ([[chiSquare]]'s stratified sibling): when the arm split is
    * imbalanced across strata (Simpson's trap), per-stratum 2×2 tables
    * pool as
    *
    *   OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ)
    *   z     = (Σaᵢ − ΣEᵢ)/√(ΣVᵢ),  Eᵢ = r1ᵢ·c1ᵢ/nᵢ,
    *   Vᵢ    = r1ᵢ·r2ᵢ·c1ᵢ·c2ᵢ/(nᵢ²(nᵢ−1))
    *
    * with a=arm∧outcome, r/c the margins. Every rational per-stratum
    * term is ONE exact integral division into micro units
    * (quantize-then-sum, the logRank/BM25 rule — all operands
    * non-negative so div ≡ floor ≡ `//`), sums are exact longs, the
    * pooled OR is one more exact integral division, and z is the usual
    * multiply/sqrt/divide/floor — fully hash-oracled; p from
    * [[normalPValueMicro]]. NULL OR when no discordant mass
    * (Σbc = 0); NULL z/p when ΣV = 0 (a margin empty in every
    * stratum). Single-subject strata contribute no variance (n−1 = 0
    * guard) — the standard convention.
    *
    * Output: `(group…, n_strata, n, or_micro, z_micro, p_micro)`.
    *
    * Scale: one hash aggregation onto (group, strata) cells, then a
    * per-group fold over the CELL relation — subjects cross exactly
    * one shuffle.
    */
  def mantelHaenszel(df: DataFrame, groupCols: Seq[String],
      strataCols: Seq[String], armCol: String,
      outcomeCol: String): DataFrame = {
    require(groupCols.nonEmpty && strataCols.nonEmpty,
      "mantelHaenszel needs group and strata columns")
    val g = groupCols.map(col)
    val st = strataCols.map(col)
    val dec = "decimal(38,0)"
    def cnt(p: org.apache.spark.sql.Column) =
      sum(when(p, 1L).otherwise(0L))
    val cells = df
      .filter(col(armCol).isNotNull && col(outcomeCol).isNotNull)
      .groupBy(g ++ st: _*)
      .agg(cnt(col(armCol) && col(outcomeCol)).as("_mh_a"),
        cnt(col(armCol) && !col(outcomeCol)).as("_mh_b"),
        cnt(!col(armCol) && col(outcomeCol)).as("_mh_c"),
        cnt(!col(armCol) && !col(outcomeCol)).as("_mh_d"))
      .withColumn("_mh_n",
        col("_mh_a") + col("_mh_b") + col("_mh_c") + col("_mh_d"))
    val terms = cells
      .withColumn("_mh_ad", expr(
        s"(CAST(_mh_a AS $dec) * _mh_d * 1000000) div CAST(_mh_n AS $dec)"))
      .withColumn("_mh_bc", expr(
        s"(CAST(_mh_b AS $dec) * _mh_c * 1000000) div CAST(_mh_n AS $dec)"))
      .withColumn("_mh_em", expr(
        s"""(CAST(_mh_a + _mh_b AS $dec) * (_mh_a + _mh_c) * 1000000)
           | div CAST(_mh_n AS $dec)""".stripMargin))
      .withColumn("_mh_vm", when(col("_mh_n") > 1L, expr(
        s"""(CAST(_mh_a + _mh_b AS $dec) * (_mh_c + _mh_d)
           | * (_mh_a + _mh_c) * (_mh_b + _mh_d) * 1000000)
           | div (CAST(_mh_n AS $dec) * _mh_n * (_mh_n - 1))""".stripMargin))
        .otherwise(lit(0L)))
    terms.groupBy(g: _*).agg(
        count(lit(1)).as("n_strata"),
        sum(col("_mh_n")).as("n"),
        sum(col("_mh_a")).as("_mh_o"),
        sum(col("_mh_ad")).as("_mh_r"),
        sum(col("_mh_bc")).as("_mh_s"),
        sum(col("_mh_em")).as("_mh_e"),
        sum(col("_mh_vm")).as("_mh_v"))
      .withColumn("or_micro", when(col("_mh_s") > 0L,
        expr(s"(CAST(_mh_r AS $dec) * 1000000) div CAST(_mh_s AS $dec)")))
      .withColumn("z_micro", when(col("_mh_v") > 0L,
        floor((col("_mh_o") * lit(1000000L) - col("_mh_e")).cast("double") *
          lit(1000.0) / sqrt(col("_mh_v").cast("double"))).cast("long")))
      .withColumn("p_micro", when(col("z_micro").isNotNull,
        normalPValueMicro(col("z_micro"))))
      .select(g ++ Seq(col("n_strata"), col("n"), col("or_micro"),
        col("z_micro"), col("p_micro")): _*)
  }

  /** Grouped Kendall τ-b rank correlation — the concordance view of
    * monotone association ([[spearmanCorr]]'s sibling; τ is what you
    * quote when tied ranks are heavy or when "probability a random pair
    * agrees" is the question being asked):
    *
    *   τ_b = (C − D) / √((n₀ − n_x)(n₀ − n_y))
    *
    * with C/D the concordant/discordant pair counts, n₀ = n(n−1)/2, and
    * n_x/n_y the pairs tied on x / on y (both-tied pairs count in each).
    * All counts are exact longs off one per-group pair relation
    * (id_a < id_b on the caller's unique `idCol` keeps each pair once);
    * the final micro value is one double multiply, sqrt, divide, floor —
    * each correctly-rounded IEEE (the Spearman discipline) — so the
    * whole row hash-oracles. NULL τ when either tie-corrected
    * denominator term is zero (x or y constant within the group).
    *
    * Output: `(group…, n_pairs, concordant, discordant, tau_micro)`.
    *
    * Scale: the pair relation is an equi-join on the GROUP key —
    * quadratic in GROUP size, linear in group count; bound the group
    * width like the exact-percentile family (SCALE.md) and fall back to
    * [[spearmanCorr]] (one sort, no pairs) when groups outgrow it. The
    * capacity contract is explicit: |group| ≤ ~10⁵ keeps per-group
    * pairs ≤ 5·10⁹ — beyond that, τ needs the sequential
    * inversion-count form, which does not shuffle-partition.
    */
  def kendallTau(df: DataFrame, groupCols: Seq[String], idCol: String,
      xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "kendallTau needs group columns")
    val g = groupCols.map(col)
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(g ++ Seq(col(idCol).as("_kt_id"),
        col(xCol).cast("long").as("_kt_x"),
        col(yCol).cast("long").as("_kt_y")): _*)
    val a = groupCols.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"_kt_g_$c"))
    val joinCond = groupCols.map(c => col(s"_kt_g_$c") === col(c))
      .reduce(_ && _) && col("_kt_id") < col("_kt_id2")
    val b = base.select(g ++ Seq(col("_kt_id").as("_kt_id2"),
      col("_kt_x").as("_kt_x2"), col("_kt_y").as("_kt_y2")): _*)
    val dx = col("_kt_x") - col("_kt_x2")
    val dy = col("_kt_y") - col("_kt_y2")
    val pairs = a.join(b, joinCond)
      .select((groupCols.map(c => col(s"_kt_g_$c").as(c)) ++ Seq(
        (dx * dy > 0L).cast("long").as("_kt_c"),
        (dx * dy < 0L).cast("long").as("_kt_d"),
        (dx === 0L && dy =!= 0L).cast("long").as("_kt_tx"),
        (dy === 0L && dx =!= 0L).cast("long").as("_kt_ty"),
        (dx === 0L && dy === 0L).cast("long").as("_kt_txy"))): _*)
    pairs.groupBy(g: _*).agg(
        count(lit(1)).as("n_pairs"),
        sum(col("_kt_c")).as("concordant"),
        sum(col("_kt_d")).as("discordant"),
        sum(col("_kt_tx") + col("_kt_txy")).as("_kt_nx"),
        sum(col("_kt_ty") + col("_kt_txy")).as("_kt_ny"))
      .select(g ++ Seq(col("n_pairs"), col("concordant"), col("discordant"),
        when((col("n_pairs") - col("_kt_nx")) > 0L &&
            (col("n_pairs") - col("_kt_ny")) > 0L,
          floor((col("concordant") - col("discordant")).cast("double") *
            lit(1000000.0) /
            sqrt((col("n_pairs") - col("_kt_nx")).cast("double") *
              (col("n_pairs") - col("_kt_ny")).cast("double")))
            .cast("long")).as("tau_micro")): _*)
  }

  /** Grouped Theil–Sen estimator — the median of all pairwise slopes
    * `(y_j − y_i)/(x_j − x_i)`, the robust trend line that one wild
    * month cannot drag the way it drags [[linearTrend]]'s least-squares
    * slope (breakdown point ~29%).
    *
    * Inputs are integer-valued (cast to long — quantize upstream, the
    * mannWhitney convention). Each pairwise slope is the EXACT floor of
    * `(y_j − y_i)·10⁶ / (x_j − x_i)` in all-long arithmetic — the
    * numerator is adjusted by its non-negative remainder
    * (`a − pmod(a, b)`) so the division is exact and no truncation
    * convention can differ between engines. Pairs tied on x carry no
    * slope and are excluded (the classical rule). The estimate is the
    * LOWER MEDIAN (1-based rank ⌊(n+1)/2⌋ in slope order) — a value
    * that actually occurs, selected purely by multiset order, so ties
    * need no tie-break to be deterministic. Output one row per group
    * with ≥1 valid pair: `(group…, n_slopes, slope_micro)`.
    *
    * Scale: the pair relation is an equi-join on the group key —
    * quadratic in group size like [[kendallTau]], and the same contract
    * applies: run it on AGGREGATED series (monthly/daily rollups, ≤10⁴
    * points/group), not raw rows; the median selection is two window
    * functions sharing one (group) sort.
    */
  def theilSen(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "theilSen needs group columns")
    val g = groupCols.map(col)
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(g ++ Seq(col(xCol).cast("long").as("_ts_x"),
        col(yCol).cast("long").as("_ts_y")): _*)
    val a = groupCols.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"_ts_g_$c"))
    val b = base.select(g ++ Seq(col("_ts_x").as("_ts_x2"),
      col("_ts_y").as("_ts_y2")): _*)
    val joinCond = groupCols.map(c => col(s"_ts_g_$c") === col(c))
      .reduce(_ && _) && col("_ts_x") < col("_ts_x2")
    val slopes = a.join(b, joinCond)
      .select((groupCols.map(c => col(s"_ts_g_$c").as(c)) :+
        expr("""(( _ts_y2 - _ts_y) * 1000000 -
                | pmod((_ts_y2 - _ts_y) * 1000000, _ts_x2 - _ts_x))
                | div (_ts_x2 - _ts_x)""".stripMargin).as("_ts_s")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("_ts_s"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    slopes
      .withColumn("_ts_rn", row_number().over(w))
      .withColumn("n_slopes", count(lit(1)).over(wc))
      .filter(col("_ts_rn") === expr("(n_slopes + 1) div 2"))
      .select(g ++ Seq(col("n_slopes"), col("_ts_s").as("slope_micro")): _*)
  }

  /** Grouped Mann–Kendall trend test (Mann '45 / Kendall '75) — the
    * non-parametric "is there a monotone trend at all?" hypothesis test
    * that pairs with [[theilSen]]'s "how steep?" estimate (same pair
    * relation, same robustness):
    *
    *   S     = Σ_{i<j by t} sgn(x_j − x_i)                 (exact long)
    *   18·Var = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)         (exact long)
    *   z     = (S ∓ 1) / √(Var)      (continuity-corrected; 0 when S=0)
    *
    * The tie term runs over groups of EQUAL x values (the standard
    * correction — without it a flat, tie-heavy series looks
    * significant). All counts are exact; z is
    * `⌊(S∓1)·10⁶ / √(var18/18)⌋` — three correctly-rounded IEEE ops —
    * and the two-sided p comes from [[normalPValueMicro]]'s rational
    * CDF (no libm), so the whole row hash-oracles. `trend` labels
    * 'increasing'/'decreasing' at p ≤ 0.05, else 'no trend'.
    *
    * Output: `(group…, n, s_stat, var18, z_micro, p_micro, trend)`;
    * z/p NULL when var18 = 0 (constant or single-point series).
    *
    * Scale: same contract as [[theilSen]]/[[kendallTau]] — the pair
    * join is quadratic in group size, run it on aggregated series; the
    * tie correction is a (group, x) hash aggregation, never pairs.
    */
  def mannKendall(df: DataFrame, groupCols: Seq[String], tCol: String,
      xCol: String): DataFrame = {
    require(groupCols.nonEmpty, "mannKendall needs group columns")
    val g = groupCols.map(col)
    val base = df
      .filter(col(tCol).isNotNull && col(xCol).isNotNull)
      .select(g ++ Seq(col(tCol).cast("long").as("_mk_t"),
        col(xCol).cast("long").as("_mk_x")): _*)
    val a = groupCols.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"_mk_g_$c"))
    val b = base.select(g ++ Seq(col("_mk_t").as("_mk_t2"),
      col("_mk_x").as("_mk_x2")): _*)
    val joinCond = groupCols.map(c => col(s"_mk_g_$c") === col(c))
      .reduce(_ && _) && col("_mk_t") < col("_mk_t2")
    val dx = col("_mk_x2") - col("_mk_x")
    val sAgg = a.join(b, joinCond)
      .select((groupCols.map(c => col(s"_mk_g_$c").as(c)) :+
        when(dx > 0L, 1L).when(dx < 0L, -1L).otherwise(0L).as("_mk_sg")): _*)
      .groupBy(g: _*).agg(sum(col("_mk_sg")).as("s_stat"))
    val ties = base.groupBy(g :+ col("_mk_x"): _*)
      .agg(count(lit(1)).as("_mk_tc"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("_mk_nvals"),
        sum(col("_mk_tc") * (col("_mk_tc") - 1L) *
          (lit(2L) * col("_mk_tc") + 5L)).as("_mk_tsum"),
        sum(col("_mk_tc")).as("n"))
    ties.join(sAgg, groupCols, "left")
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("var18",
        col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L) -
          col("_mk_tsum"))
      .withColumn("z_micro", when(col("var18") > 0L,
        floor((when(col("s_stat") > 0L, col("s_stat") - 1L)
            .when(col("s_stat") < 0L, col("s_stat") + 1L)
            .otherwise(lit(0L))).cast("double") * lit(1000000.0) /
          sqrt(col("var18").cast("double") / lit(18.0))).cast("long")))
      .withColumn("p_micro",
        when(col("z_micro").isNotNull, normalPValueMicro(col("z_micro"))))
      .select(g ++ Seq(col("n"), col("s_stat"), col("var18"), col("z_micro"),
        col("p_micro"),
        when(col("p_micro").isNotNull && col("p_micro") <= 50000L &&
            col("s_stat") > 0L, "increasing")
          .when(col("p_micro").isNotNull && col("p_micro") <= 50000L &&
            col("s_stat") < 0L, "decreasing")
          .otherwise("no trend").as("trend")): _*)
  }

  /** Grouped two-feature OLS (y = b₀ + b₁x₁ + b₂x₂) by Cramer's rule on
    * the centered normal equations with CLEARED DENOMINATORS — the
    * multivariate extension of [[linearTrend]], exact until the final
    * divisions (the cohenKappa arithmetic):
    *
    *   D_uv  = n·Σuv − Σu·Σv                     (exact decimal(38,0))
    *   det   = D₁₁·D₂₂ − D₁₂²                    (exact)
    *   b₁    = (D₁y·D₂₂ − D₂y·D₁₂) / det         (one double division)
    *   b₂    = (D₂y·D₁₁ − D₁y·D₁₂) / det
    *   b₀    = (Σy − b₁Σx₁ − b₂Σx₂) / n
    *   R²    = (b₁·D₁y + b₂·D₂y) / D_yy
    *
    * Inputs quantize to `⌊v·quantum⌋` longs first (definitional, the
    * mannWhitney/welch convention) — the shared scale cancels in the
    * slopes, and the intercept/micro outputs divide it back out. All
    * moment sums and D-products are exact; the b₁/b₂/b₀/R² trees are
    * fixed IEEE expressions, so micro-floored outputs hash-oracle.
    *
    * Capacity: with |v·quantum| ≤ V and group size n, the numerators
    * need n³V⁴ ≲ 10³⁸ — e.g. V = 10⁷, n = 2·10⁴ leaves 10⁷ headroom;
    * rescale `quantum` down for wider-range variables (the slope is
    * scale-invariant, only resolution changes). Degenerate groups
    * (collinear or constant features → det ≤ 0) yield null slopes.
    *
    * Scale: ONE full-data aggregation pass to ten exact moments per
    * group (map-side partials); Cramer runs on the |groups|-row moment
    * relation. The normal-equation moments ARE the sufficient
    * statistics for OLS, so no iterative solver ever touches the data.
    */
  def olsTwoFeature(df: DataFrame, groupCols: Seq[String], x1Col: String,
      x2Col: String, yCol: String, quantum: Long = 100L): DataFrame = {
    require(groupCols.nonEmpty, "olsTwoFeature needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    def q(c: String) = floor(col(c) * quantum).cast("long")
    val rows = df
      .filter(col(x1Col).isNotNull && col(x2Col).isNotNull &&
        col(yCol).isNotNull)
      .select(g ++ Seq(q(x1Col).as("_ol_x1"), q(x2Col).as("_ol_x2"),
        q(yCol).as("_ol_y")): _*)
    def s(e: org.apache.spark.sql.Column) = sum(e.cast(dec))
    val m = rows.groupBy(g: _*).agg(
      count(lit(1)).as("n"),
      s(col("_ol_x1")).as("s1"), s(col("_ol_x2")).as("s2"),
      s(col("_ol_y")).as("sy"),
      s(col("_ol_x1") * col("_ol_x1")).as("s11"),
      s(col("_ol_x2") * col("_ol_x2")).as("s22"),
      s(col("_ol_x1") * col("_ol_x2")).as("s12"),
      s(col("_ol_x1") * col("_ol_y")).as("s1y"),
      s(col("_ol_x2") * col("_ol_y")).as("s2y"),
      s(col("_ol_y") * col("_ol_y")).as("syy"))
    val nD = col("n").cast(dec)
    val d11 = nD * col("s11") - col("s1") * col("s1")
    val d22 = nD * col("s22") - col("s2") * col("s2")
    val d12 = nD * col("s12") - col("s1") * col("s2")
    val d1y = nD * col("s1y") - col("s1") * col("sy")
    val d2y = nD * col("s2y") - col("s2") * col("sy")
    val dyy = nD * col("syy") - col("sy") * col("sy")
    val det = d11 * d22 - d12 * d12
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val b1 = (d(d1y) * d(d22) - d(d2y) * d(d12)) / d(det)
    val b2 = (d(d2y) * d(d11) - d(d1y) * d(d12)) / d(det)
    val b0q = (d(col("sy")) - b1 * d(col("s1")) - b2 * d(col("s2"))) /
      d(col("n"))
    val r2 = (b1 * d(d1y) + b2 * d(d2y)) / d(dyy)
    val ok = det > lit(0).cast(dec) && dyy > lit(0).cast(dec)
    m.select((g ++ Seq(col("n"),
      when(ok, floor(b0q / quantum * 1000000.0).cast("long"))
        .as("b0_micro"),
      when(ok, floor(b1 * 1000000.0).cast("long")).as("b1_micro"),
      when(ok, floor(b2 * 1000000.0).cast("long")).as("b2_micro"),
      when(ok, floor(r2 * 1000000.0).cast("long")).as("r2_micro"))): _*)
  }

  /** Two-sided normal p-value (micro units) from a micro z-score —
    * WITHOUT transcendental functions. The engine-portability problem:
    * `exp`/`erf` are libm calls whose low bits differ between runtimes,
    * so any CDF built on them can flip a micro rounding boundary between
    * engines. Abramowitz & Stegun 26.2.19 is a pure-rational
    * approximation (|ε| < 1.5·10⁻⁷ — below the micro quantum):
    *
    *   2·(1 − Φ(|z|)) = (1 + d₁|z| + … + d₆|z|⁶)⁻¹⁶
    *
    * evaluated as a FIXED expression tree — Horner for the polynomial,
    * four explicit squarings for the 16th power — in which every step
    * is an individually-correctly-rounded IEEE op. Any engine that
    * spells the same tree computes the same 64 bits; `p_micro =
    * ⌊10⁶·p⌋` then hash-oracles. NULL z (a degenerate test) stays NULL.
    */
  def normalPValueMicro(zMicro: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val z = abs(zMicro).cast("double") / lit(1000000.0)
    val b = lit(1.0) + z * (lit(0.0498673470) + z * (lit(0.0211410061) +
      z * (lit(0.0032776263) + z * (lit(0.0000380036) +
      z * (lit(0.0000488906) + z * lit(0.0000053830))))))
    val b2 = b * b
    val b4 = b2 * b2
    val b8 = b4 * b4
    val b16 = b8 * b8
    floor(lit(1000000.0) / b16).cast("long")
  }

  /** Benjamini–Hochberg step-up FDR adjustment (Benjamini & Hochberg
    * '95) over a relation of TESTS — the multiple-comparisons gate every
    * screening pipeline needs once it runs one test per segment/feature
    * (35 segment A/B tests at α=0.05 expect 1.75 false positives;
    * BH caps the false-discovery RATE instead).
    *
    * All-integer step-up on micro p-values: tests rank ascending by
    * `(p, tieCols)` (row_number — a deterministic total order), and
    *
    *   p_adj(i) = min( min_{j ≥ i} ⌊p(j)·m / j⌋, 10⁶ )
    *
    * computed as a reverse running minimum — exactly R's `p.adjust`
    * shape, floored to micro. Rejections at level α compare
    * `p_adj_micro <= α_micro`. Null p rows (degenerate tests) are
    * excluded from both m and the ranking and return with null rank/adj.
    *
    * Scale: the input is the TEST relation — one row per hypothesis, m
    * rows total. A single-partition window over m rows is the correct
    * shape even at m = 10⁵ feature screens (the data-sized work already
    * happened in the upstream aggregation that produced the tests);
    * windows here never see raw data.
    */
  def bhAdjust(df: DataFrame, pCol: String, tieCols: Seq[String]): DataFrame = {
    require(tieCols.nonEmpty, "bhAdjust needs tie-break columns for a total order")
    // ONE pass over the test relation. Null p rows sort LAST under
    // asc_nulls_last, so the non-null rows get ranks 1..m exactly as a
    // pre-filtered ranking would, `count(pCol)` excludes nulls from m,
    // and every null-p output column is guarded by `when(nn, …)`. The
    // reverse running min ignores the null `_bh_raw` of those trailing
    // rows (they lead the desc order; `min` skips nulls), so
    // p_adj(i) = min_{j ≥ i} raw(j) is untouched. The previous
    // two-branch union referenced `df` twice and re-executed the ENTIRE
    // upstream test-producing plan (a full-corpus aggregation in the
    // screening use) once per branch.
    val nn = col(pCol).isNotNull
    val wRank = Window.orderBy(col(pCol).asc_nulls_last +: tieCols.map(col): _*)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRev = Window.orderBy(col("_bh_rn").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("_bh_rn", row_number().over(wRank).cast("long"))
      .withColumn("_bh_m", count(col(pCol)).over(wAll))
      .withColumn("_bh_raw", when(nn, expr(s"($pCol * _bh_m) div _bh_rn")))
      .withColumn("p_adj_micro",
        when(nn, least(min(col("_bh_raw")).over(wRev), lit(1000000L))))
      .withColumn("bh_rank", when(nn, col("_bh_rn")))
      .drop("_bh_rn", "_bh_m", "_bh_raw")
  }

  /** Difference-in-differences estimator — the quasi-experimental
    * readout when treatment was NOT randomized but a pre-period exists:
    * `DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)` nets out both
    * the stable treated-vs-control gap and the common time trend
    * (parallel-trends assumption). Completes the causal family next to
    * [[cuped]] (randomized + covariate) and [[welchTTest]] (randomized,
    * raw): same arm/metric conventions, one extra `postCol` boolean.
    *
    * Returns one row per group: the four cell counts, the four cell
    * means, and `did_micro`, all means in integer 10⁻⁶ y-units.
    * Deterministic by the [[welchTTest]] argument: y quantizes to 10⁻⁴
    * longs, the four conditional sums accumulate in decimal(38,0) in ONE
    * aggregation pass, each mean is one integral `div` (micro = 100×
    * the 10⁻⁴ sum), and the estimate is integer subtraction of those
    * exact means. An empty cell NULLs its mean and the estimate (no
    * counterfactual to difference); counts are always defined.
    *
    * Scale: ONE hash aggregation with map-side partials — eight
    * conditional sums, |groups| rows out, no window, no second pass.
    */
  def diffInDiff(df: DataFrame, groupCols: Seq[String], armCol: String,
      postCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "diffInDiff needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val rows = df
      .filter(col(armCol).isNotNull && col(postCol).isNotNull &&
        col(yCol).isNotNull)
      .select(g ++ Seq(col(armCol).as("_dd_t"), col(postCol).as("_dd_p"),
        floor(col(yCol) * 10000).cast("long").cast(dec).as("_dd_y")): _*)
    def cell(t: Boolean, p: Boolean) = col("_dd_t") === t && col("_dd_p") === p
    def n(t: Boolean, p: Boolean) =
      count(when(cell(t, p), 1L))
    def s(t: Boolean, p: Boolean) =
      sum(when(cell(t, p), col("_dd_y")))
    val agg = rows.groupBy(g: _*).agg(
      n(true, false).as("n_t_pre"), n(true, true).as("n_t_post"),
      n(false, false).as("n_c_pre"), n(false, true).as("n_c_post"),
      s(true, false).as("_dd_stpre"), s(true, true).as("_dd_stpost"),
      s(false, false).as("_dd_scpre"), s(false, true).as("_dd_scpost"))
    def mean(sc: String, nc: String) =
      when(col(nc) > 0L, expr(s"($sc * 100) div $nc").cast("long"))
    agg
      .withColumn("mean_t_pre_micro", mean("_dd_stpre", "n_t_pre"))
      .withColumn("mean_t_post_micro", mean("_dd_stpost", "n_t_post"))
      .withColumn("mean_c_pre_micro", mean("_dd_scpre", "n_c_pre"))
      .withColumn("mean_c_post_micro", mean("_dd_scpost", "n_c_post"))
      .withColumn("did_micro",
        (col("mean_t_post_micro") - col("mean_t_pre_micro")) -
          (col("mean_c_post_micro") - col("mean_c_pre_micro")))
      .drop("_dd_stpre", "_dd_stpost", "_dd_scpre", "_dd_scpost")
  }

  /** Isotonic (PAV) calibration over score bins — the monotone
    * recalibration map Zadrozny & Elkan '02 fit with pool-adjacent-
    * violators, computed here by the equivalent minimax identity
    *
    *   iso(k) = max_{i ≤ k} min_{j ≥ k} ( pos[i..j] / n[i..j] )
    *
    * (Robertson/Wright/Dykstra '88 §1.2) so the whole fit is relational
    * — no sequential pooling loop. Where [[calibrationReport]] only
    * MEASURES miscalibration, this produces the corrected probability a
    * serving layer would apply; the fitted curve is the raw bin rates
    * with every non-monotone run pooled to its weighted average.
    *
    * Determinism: bin counts are exact longs; each interval average is
    * ONE IEEE division of two exact longs (correctly rounded, identical
    * on any IEEE engine; sums < 2⁵³ to ~10¹⁵ rows/group); min/max over
    * those doubles carry no accumulation order; the report floors to
    * micro units after one exact-by-cases ×10⁶. Bins with no rows take
    * no part (PAV over the occupied subsequence — the standard weighted
    * form); raw `rate_micro` is an integral `div`.
    *
    * Scale: the data-sized work is ONE hash aggregation onto ≤nBins
    * cells per group with map-side partials. The minimax triple join
    * runs on that cell relation — ≤ C(nBins+2,3) ≈ nBins³/6 tuples per
    * group (220 at the default 10) — broadcast-scale regardless of
    * input rows, the same "windows never see raw data" shape as
    * [[prCurve]].
    */
  def isotonicCalibration(df: DataFrame, groupCols: Seq[String],
      scoreCol: String, labelCol: String, nBins: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "isotonicCalibration needs group columns")
    require(nBins > 0, "isotonicCalibration needs positive nBins")
    val g = groupCols.map(col)
    val bin = least(greatest(floor(col(scoreCol) * nBins), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    val cells = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(g ++ Seq(bin.as("bin"),
        when(col(labelCol), 1L).otherwise(0L).as("_ic_y")): _*)
      .groupBy(g :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"), sum(col("_ic_y")).as("pos"))
      .persist()
    val pre = cells.withColumn("_ic_cn",
        sum(col("n")).over(Window.partitionBy(g: _*).orderBy(col("bin"))))
      .withColumn("_ic_cp",
        sum(col("pos")).over(Window.partitionBy(g: _*).orderBy(col("bin"))))
    def side(tag: String) = pre.select(
      g.zip(groupCols).map { case (c, nm) => c.as(s"_$tag$nm") } ++ Seq(
        col("bin").as(s"_${tag}bin"), col("n").as(s"_${tag}n"),
        col("pos").as(s"_${tag}pos"), col("_ic_cn").as(s"_${tag}cn"),
        col("_ic_cp").as(s"_${tag}cp")): _*)
    def keys(a: String, b: String) = groupCols
      .map(nm => col(s"_$a$nm") === col(s"_$b$nm"))
      .reduce(_ && _)
    // interval averages from prefix sums: avg(i..j) over occupied bins
    val pairs = side("i").join(side("j"),
        keys("i", "j") && col("_ibin") <= col("_jbin"))
      .withColumn("_ic_avg",
        (col("_jcp") - col("_icp") + col("_ipos")).cast("double") /
          (col("_jcn") - col("_icn") + col("_in")).cast("double"))
    val ks = cells.select(
      g.zip(groupCols).map { case (c, nm) => c.as(s"_k$nm") } :+
        col("bin").as("_kbin"): _*)
    val iso = pairs.join(ks,
        keys("i", "k") && col("_ibin") <= col("_kbin") &&
          col("_kbin") <= col("_jbin"))
      .groupBy(groupCols.map(nm => col(s"_k$nm")) ++
        Seq(col("_kbin"), col("_ibin")): _*)
      .agg(min(col("_ic_avg")).as("_ic_minavg"))
      .groupBy(groupCols.map(nm => col(s"_k$nm")) :+ col("_kbin"): _*)
      .agg(max(col("_ic_minavg")).as("_ic_iso"))
    cells.join(iso,
        groupCols.map(nm => col(nm) === col(s"_k$nm")).reduce(_ && _) &&
          col("bin") === col("_kbin"))
      .select(g ++ Seq(col("bin"), col("n"), col("pos"),
        expr("(pos * 1000000) div n").as("rate_micro"),
        floor(col("_ic_iso") * 1000000.0).cast("long").as("iso_micro")): _*)
  }

  /** Kruskal–Wallis H per group — the k-arm extension of [[mannWhitney]]
    * (same doubled-midrank machinery): "do any of these k cohorts differ
    * in location?" without normality assumptions.
    *
    *   H  = 12/(n(n+1)) · Σ_i R_i²/n_i − 3(n+1)
    *   H' = H / (1 − Σ(t³−t)/(n³−n))             (tie-corrected)
    *
    * With doubled midranks `ra2_i = Σ 2·midrank`, each arm's
    * `R_i²/n_i = ra2_i²/(4n_i)` is taken as the EXACT integral floor
    * `ra2_i² div (4·n_i)` (one deterministic floor per arm, error < 1
    * in rank² units — definitional, like every micro quantum here), so
    * the cross-arm sum is an exact decimal, never an order-dependent
    * float sum. H and H' are then fixed IEEE trees over exact integer
    * aggregates, reported micro-floored. Ties are defined on the
    * 10⁻⁴-quantized values (the mannWhitney convention). Groups with
    * n ≤ 1 or all values tied (correction ≤ 0) report NULL
    * `h_tie_micro`.
    *
    * Output: `(group…, n, k_arms, h_micro, h_tie_micro)`.
    *
    * Scale: identical shape to [[mannWhitney]] — one hash shuffle on
    * the group key serves the rank window, the tie window, and both
    * aggregations; the arm relation (k rows per group) is where all
    * the arithmetic happens.
    */
  def kruskalWallis(df: DataFrame, groupCols: Seq[String], armCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "kruskalWallis needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val rows = df.filter(col(yCol).isNotNull && col(armCol).isNotNull)
      .select(g ++ Seq(col(armCol).as("_kw_a"),
        floor(col(yCol) * 10000).cast("long").as("_kw_y")): _*)
    val rk = rank().over(Window.partitionBy(g: _*).orderBy(col("_kw_y")))
    val tie = count(lit(1)).over(Window.partitionBy(g :+ col("_kw_y"): _*))
    val ranked = rows
      .withColumn("_kw_r2", lit(2L) * rk + tie - lit(1L))
      .withColumn("_kw_t", tie)
    val arms = ranked.groupBy(g :+ col("_kw_a"): _*).agg(
      count(lit(1)).as("_kw_ni"),
      sum(col("_kw_r2").cast(dec)).as("_kw_ra2"),
      // Σ(t³−t) contribution of this arm's rows (t²−1 per row)
      sum((col("_kw_t") * col("_kw_t") - 1L).cast(dec)).as("_kw_tiesum"))
    val agg = arms.groupBy(g: _*).agg(
      sum(col("_kw_ni")).as("n"),
      count(lit(1)).as("k_arms"),
      sum(expr(s"(_kw_ra2 * _kw_ra2) div (4 * cast(_kw_ni as $dec))")
        .cast(dec)).as("_kw_s"),
      sum(col("_kw_tiesum")).as("_kw_ties"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val h = lit(12.0) * d(col("_kw_s")) / (d(col("n")) * (d(col("n")) + 1.0)) -
      lit(3.0) * (d(col("n")) + 1.0)
    val corr = lit(1.0) - d(col("_kw_ties")) /
      (d(col("n").cast(dec) * col("n") * col("n") - col("n")))
    // k_arms = 1 has no between-arm contrast — H degenerates (floor
    // loss can even push it negative); NULL, mirroring anovaF's guard.
    agg.select(g ++ Seq(col("n"), col("k_arms"),
      when(col("n") > 1L && col("k_arms") > 1L,
        floor(h * 1000000.0).cast("long")).as("h_micro"),
      when(col("n") > 1L && col("k_arms") > 1L && corr > 0.0,
        floor(h / corr * 1000000.0).cast("long")).as("h_tie_micro")): _*)
  }

  /** One-way ANOVA F per group — the parametric k-arm twin of
    * [[kruskalWallis]] (and the k-arm extension of [[welchTTest]]'s
    * pooled-variance ancestor): between/within variance ratio over k
    * cohort arms.
    *
    *   SSB = Σ_i s_i²/n_i − S²/n,   SSW = Q − Σ_i s_i²/n_i
    *   F   = (SSB/(k−1)) / (SSW/(n−k))
    *
    * on 10⁻⁴-quantized values: n_i/s_i/q_i are exact decimal moments,
    * each `s_i² div n_i` is an exact integral floor (deterministic,
    * error < 1 quantum² — the kruskalWallis rationale), so SSB/SSW are
    * exact decimals and F is ONE double division of two fixed product
    * trees, micro-floored. Degenerate groups (n ≤ k, or SSW ≤ 0 —
    * all-identical arms) report NULL `f_micro`.
    *
    * Output: `(group…, n, k_arms, df1, df2, f_micro)`.
    *
    * Scale: ONE full-data hash aggregation onto (group, arm) cells with
    * map-side partials; everything after runs on the k-row arm relation.
    * Capacity: the integral divisions return BIGINT, so the binding
    * bound is `s_i²/n_i ≈ n_i·V̄² ≤ 9·10¹⁸` at quantized mean magnitude
    * V̄ — e.g. V̄ = 10⁷ holds to ~10⁵ rows/arm; rescale the quantum down
    * for wider arms (F is scale-invariant, only resolution changes).
    */
  def anovaF(df: DataFrame, groupCols: Seq[String], armCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "anovaF needs group columns")
    val g = groupCols.map(col)
    val rows = df.filter(col(yCol).isNotNull && col(armCol).isNotNull)
      .select(g ++ Seq(col(armCol).as("_af_a"),
        floor(col(yCol) * 10000).cast("long").as("_af_y")): _*)
    anovaFOnQuantized(rows, groupCols)
  }

  /** [[anovaF]]'s core on an already-quantized `(group…, _af_a, _af_y)`
    * long frame — shared with [[brownForsythe]], whose |y − med| inputs
    * are exact longs already (re-quantizing them ×10⁴ would push
    * `s_i² div n_i` past the BIGINT the integral division returns —
    * the overflow the capacity note bounds).
    */
  private def anovaFOnQuantized(rows: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val arms = rows.groupBy(g :+ col("_af_a"): _*).agg(
      count(lit(1)).as("_af_ni"),
      sum(col("_af_y").cast(dec)).as("_af_si"),
      sum((col("_af_y").cast(dec) * col("_af_y")).cast(dec)).as("_af_qi"))
    val agg = arms.groupBy(g: _*).agg(
      sum(col("_af_ni")).as("n"),
      count(lit(1)).as("k_arms"),
      sum(col("_af_si")).as("_af_s"),
      sum(col("_af_qi")).as("_af_q"),
      sum(expr(s"(_af_si * _af_si) div cast(_af_ni as $dec)").cast(dec))
        .as("_af_b"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val ssb = col("_af_b") - expr(s"(_af_s * _af_s) div cast(n as $dec)")
    val ssw = col("_af_q") - col("_af_b")
    val fOk = col("k_arms") > 1L && col("n") > col("k_arms") && ssw > 0.0
    agg.select(g ++ Seq(col("n"), col("k_arms"),
      (col("k_arms") - 1L).as("df1"), (col("n") - col("k_arms")).as("df2"),
      when(fOk, floor(
        d(ssb) * (d(col("n")) - d(col("k_arms"))) /
          (d(ssw) * (d(col("k_arms")) - 1.0)) * 1000000.0).cast("long"))
        .as("f_micro")): _*)
  }

  /** Pettitt changepoint test per group (Pettitt '79) — "did this series
    * shift level, and when?" — the rank-based single-changepoint screen
    * that pairs with [[mannKendall]]'s monotone-trend test (same
    * robustness, same exact-rank machinery):
    *
    *   U_τ = 2·S_τ − τ(n+1)   where S_τ = Σ_{i≤τ} rank(x_i)
    *   K   = max_{τ<n} |U_τ|,  significant iff 2·exp(−6K²/(n³+n²)) ≤ 0.05
    *
    * With doubled midranks, `U_τ = Σ_{i≤τ} 2·midrank_i − τ(n+1)` is an
    * EXACT long for every prefix — one running sum in time order. The
    * significance gate clears the exp: p ≤ 0.05 ⟺ 6K² ≥ −ln(0.025)·
    * (n³+n²), compared as `6·K²·10⁶ ≥ 3688879·(n³+n²)` in exact
    * decimals (the ln constant micro-floored — definitional boundary,
    * no libm call on either engine). The changepoint is the EARLIEST τ
    * attaining K (deterministic tie-break). Requires one row per
    * distinct `tCol` value per group — feed an aggregated series (the
    * [[theilSen]] contract); duplicate timestamps would make the
    * prefix order engine-dependent.
    *
    * Output: `(group…, n, k_stat, cp_t, signif)` — `cp_t` the last
    * index of the pre-shift segment; n < 2 reports NULL cp/signif.
    *
    * Scale: one group-key shuffle serves the rank window, the prefix
    * window, and the final max-election; state is the per-group sort.
    */
  def pettittTest(df: DataFrame, groupCols: Seq[String], tCol: String,
      xCol: String): DataFrame = {
    require(groupCols.nonEmpty, "pettittTest needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val rows = df.filter(col(tCol).isNotNull && col(xCol).isNotNull)
      .select(g ++ Seq(col(tCol).cast("long").as("_pt_t"),
        col(xCol).cast("long").as("_pt_x")): _*)
    val rk = rank().over(Window.partitionBy(g: _*).orderBy(col("_pt_x")))
    val tie = count(lit(1)).over(Window.partitionBy(g :+ col("_pt_x"): _*))
    val wt = Window.partitionBy(g: _*).orderBy(col("_pt_t"))
    val pre = rows
      .withColumn("_pt_r2", lit(2L) * rk + tie - lit(1L))
      .withColumn("_pt_tau", row_number().over(wt))
      .withColumn("_pt_n", count(lit(1)).over(Window.partitionBy(g: _*)))
      .withColumn("_pt_u",
        sum(col("_pt_r2")).over(wt) - col("_pt_tau") * (col("_pt_n") + 1L))
    val elect = pre.filter(col("_pt_tau") < col("_pt_n"))
      .groupBy(g: _*).agg(
        // earliest τ attaining max |U|: max(|U|, −t) then un-negate
        max(struct(abs(col("_pt_u")).as("k"), (-col("_pt_t")).as("negt")))
          .as("_pt_e"))
      .select(g ++ Seq(col("_pt_e.k").as("k_stat"),
        (-col("_pt_e.negt")).as("cp_t")): _*)
    val ns = rows.groupBy(g: _*).agg(count(lit(1)).as("n"))
    ns.join(elect, groupCols, "left")
      .select(g ++ Seq(col("n"), col("k_stat"), col("cp_t"),
        when(col("k_stat").isNotNull,
          lit(6L).cast(dec) * col("k_stat") * col("k_stat") * lit(1000000L) >=
            lit(3688879L).cast(dec) *
              (col("n").cast(dec) * col("n") * col("n") +
                col("n").cast(dec) * col("n"))).as("signif")): _*)
  }

  /** Grouped ranking-evaluation metrics — MRR@k, NDCG@k, AP@k per query
    * group, the retrieval-quality triple for search / RAG / recommender
    * offline eval (the ranking-side sibling of [[rocAuc]]):
    *
    *   MRR  = 1/rank of the first relevant hit within k
    *   DCG  = Σ_{r≤k} (2^rel − 1)/log₂(r+1),  NDCG = DCG/IDCG
    *   AP   = (Σ_{rel hits r≤k} precision@r) / min(R, k)
    *
    * Deterministic cross-engine: gains are exact integers
    * (`2^rel − 1` via shiftleft), each 1/log₂(r+1) weight is the exact
    * integral floor of `gain·693147·10⁶ div round(ln(r+1)·10⁶)` (ln
    * micro-rounded — the charEntropy micro-nat rule; ln2 micro-floored
    * at 693147), each precision@r is `hits·10⁶ div r`, and every sum
    * runs over exact longs/decimals. IDCG re-weights the SAME gain
    * multiset by ideal position (row_number on rel desc — position
    * determines weight, so tie order cannot change the sum). NDCG/AP
    * divide once at the end (`div`, exact). Groups with no relevant
    * docs report 0 MRR/AP and NULL NDCG (IDCG = 0).
    *
    * Input: one row per (group…, rank, rel) — `rankCol` 1-based and
    * unique per group, `relCol` a small non-negative integer grade
    * (≤ 30 for shiftleft headroom).
    *
    * Output: `(group…, n_docs, n_rel, mrr_micro, ndcg_micro, ap_micro)`.
    *
    * Scale: one group-key shuffle serves both position windows and the
    * final aggregation; per-group state is the sort — run per query
    * list (≤ 10³ candidates), the natural shape of ranking eval.
    */
  def rankingMetrics(df: DataFrame, groupCols: Seq[String], rankCol: String,
      relCol: String, k: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "rankingMetrics needs group columns")
    require(k > 0, "rankingMetrics needs positive k")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val rows = df.filter(col(rankCol).isNotNull && col(relCol).isNotNull)
      .select(g ++ Seq(col(rankCol).cast("long").as("_rm_r"),
        col(relCol).cast("long").as("_rm_rel")): _*)
    val gain = expr("shiftleft(1L, cast(_rm_rel as int)) - 1L")
    val ideal = row_number().over(Window.partitionBy(g: _*)
      .orderBy(col("_rm_rel").desc, col("_rm_r")))
    val pre = rows
      .withColumn("_rm_g", gain)
      .withColumn("_rm_ir", ideal)
      .withColumn("_rm_hits", sum(when(col("_rm_rel") > 0L, 1L).otherwise(0L))
        .over(Window.partitionBy(g: _*).orderBy(col("_rm_r"))))
    val agg = pre.groupBy(g: _*).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("_rm_rel") > 0L, 1L).otherwise(0L)).as("n_rel"),
      sum(when(col("_rm_r") <= k && col("_rm_g") > 0L,
        expr(s"(cast(_rm_g as $dec) * 693147 * 1000000) div " +
          "cast(round(ln(cast(_rm_r + 1 as double)) * 1e6) " +
          s"as $dec)").cast(dec)).otherwise(lit(0L).cast(dec))).as("_rm_dcg"),
      sum(when(col("_rm_ir") <= k && col("_rm_g") > 0L,
        expr(s"(cast(_rm_g as $dec) * 693147 * 1000000) div " +
          "cast(round(ln(cast(_rm_ir + 1 as double)) * 1e6) " +
          s"as $dec)").cast(dec)).otherwise(lit(0L).cast(dec))).as("_rm_idcg"),
      min(when(col("_rm_rel") > 0L && col("_rm_r") <= k, col("_rm_r")))
        .as("_rm_first"),
      sum(when(col("_rm_rel") > 0L && col("_rm_r") <= k,
        expr("(_rm_hits * 1000000) div _rm_r")).otherwise(lit(0L)))
        .as("_rm_apsum"))
    agg.select(g ++ Seq(col("n_docs"), col("n_rel"),
      coalesce(expr("1000000 div _rm_first"), lit(0L)).as("mrr_micro"),
      when(col("_rm_idcg") > 0L,
        expr("(_rm_dcg * 1000000) div _rm_idcg").cast("long"))
        .as("ndcg_micro"),
      when(col("n_rel") > 0L,
        expr(s"_rm_apsum div least(n_rel, ${k.toLong})"))
        .otherwise(lit(0L)).as("ap_micro")): _*)
  }

  /** Brown–Forsythe variance-homogeneity test per group — "do these k
    * cohorts differ in SPREAD?" — the robust Levene variant that [[anovaF]]
    * assumes away (ANOVA compares means under equal variances; this
    * checks that assumption, and is itself a dispersion test): an ANOVA
    * F computed on absolute deviations from each arm's MEDIAN.
    *
    * The arm center is the LOWER MEDIAN (1-based order statistic
    * ⌊(n+1)/2⌋ of the 10⁻⁴-quantized values — the [[theilSen]] election:
    * an actual value, selected purely by multiset order, so it is
    * deterministic without a tie-break and EXACT — no interpolation,
    * no percentile buffering beyond the sort). `z = |y − med|` is then
    * exact long arithmetic and the rest IS [[anovaF]] on z (delegated,
    * so the two share semantics by construction).
    *
    * Output: `(group…, n, k_arms, df1, df2, f_micro)` — f_micro NULL
    * for degenerate groups (anovaF guards).
    *
    * Scale: ONE (group, arm) hash shuffle serves the rank window, the
    * median election window, and feeds anovaF's aggregation; per-arm
    * state is the sort.
    */
  def brownForsythe(df: DataFrame, groupCols: Seq[String], armCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "brownForsythe needs group columns")
    val g = groupCols.map(col)
    val rows = df.filter(col(yCol).isNotNull && col(armCol).isNotNull)
      .select(g ++ Seq(col(armCol).as("_bf_a"),
        floor(col(yCol) * 10000).cast("long").as("_bf_y")): _*)
    val wa = Window.partitionBy(g :+ col("_bf_a"): _*)
    val pre = rows
      .withColumn("_bf_rn", row_number().over(wa.orderBy(col("_bf_y"))))
      .withColumn("_bf_cnt", count(lit(1)).over(wa))
    val z = pre
      .withColumn("_bf_med", max(when(
        col("_bf_rn") === expr("(_bf_cnt + 1) div 2"), col("_bf_y"))).over(wa))
      // |y − med| is an exact long in the same 10⁻⁴ quanta as y — it
      // feeds the anovaF core DIRECTLY (F is scale-invariant, and a
      // second ×10⁴ quantization would overflow s_i² div n_i's BIGINT)
      .select(g ++ Seq(col("_bf_a").as("_af_a"),
        abs(col("_bf_y") - col("_bf_med")).as("_af_y")): _*)
    anovaFOnQuantized(z, groupCols)
  }

  /** Cochran–Armitage trend test per group — "does the success rate TREND
    * across these ordered categories?" (dose–response, week-over-week
    * conversion drift): more powerful than [[chiSquare]]'s any-difference
    * alternative when the categories carry an order.
    *
    * With integer category scores t, counts n_i (rows) and r_i
    * (successes) per category, N = Σn, R = Σr:
    *
    *   z = (N·Σt·r − R·Σt·n) / √( R(N−R)(N·Σt²n − (Σt·n)²) / N )
    *
    * Numerator and the radicand's factors are EXACT decimals (cleared
    * denominators — the cohenKappa discipline); z is one IEEE
    * division + sqrt, micro-floored, with the two-sided p from
    * [[normalPValueMicro]]'s rational CDF. Degenerate groups (R = 0,
    * R = N, or zero score variance) report NULL z/p.
    *
    * Output: `(group…, n, r, z_micro, p_micro)`.
    *
    * Scale: ONE full-data hash aggregation onto (group, score) cells
    * with map-side partials; the trend arithmetic runs on the ≤|scores|
    * cell relation.
    */
  def cochranArmitage(df: DataFrame, groupCols: Seq[String],
      scoreCol: String, successCol: String): DataFrame = {
    require(groupCols.nonEmpty, "cochranArmitage needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val cells = df.filter(col(scoreCol).isNotNull && col(successCol).isNotNull)
      .select(g ++ Seq(col(scoreCol).cast("long").as("_ca_t"),
        when(col(successCol), 1L).otherwise(0L).as("_ca_s")): _*)
      .groupBy(g :+ col("_ca_t"): _*)
      .agg(count(lit(1)).as("_ca_n"), sum(col("_ca_s")).as("_ca_r"))
    val agg = cells.groupBy(g: _*).agg(
      sum(col("_ca_n")).as("n"), sum(col("_ca_r")).as("r"),
      sum((col("_ca_t") * col("_ca_n")).cast(dec)).as("_ca_tn"),
      sum((col("_ca_t") * col("_ca_r")).cast(dec)).as("_ca_tr"),
      sum((col("_ca_t") * col("_ca_t")).cast(dec) * col("_ca_n"))
        .as("_ca_ttn"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val num = col("n").cast(dec) * col("_ca_tr") -
      col("r").cast(dec) * col("_ca_tn")
    val rad = col("r").cast(dec) * (col("n") - col("r")) *
      (col("n").cast(dec) * col("_ca_ttn") - col("_ca_tn") * col("_ca_tn"))
    val ok = col("r") > 0L && col("r") < col("n") &&
      col("n").cast(dec) * col("_ca_ttn") - col("_ca_tn") * col("_ca_tn") > 0L
    agg
      .withColumn("z_micro", when(ok,
        floor(d(num) / sqrt(d(rad) / d(col("n"))) * 1000000.0).cast("long")))
      .withColumn("p_micro",
        when(col("z_micro").isNotNull, normalPValueMicro(col("z_micro"))))
      .select(g ++ Seq(col("n"), col("r"), col("z_micro"),
        col("p_micro")): _*)
  }

  /** Operating-point selection per group — "what threshold do I ship?"
    * — the decision step after [[prCurve]]: among all score cutoffs
    * whose cumulative precision meets the target, pick the LOWEST (=
    * maximum recall at acceptable precision). Scanning thresholds
    * descending, predicting positive at `score ≥ t`:
    *
    *   prec(t) = cumTP/cumN,  recall(t) = cumTP/P
    *
    * Scores quantize to 10⁻⁴ (the prCurve convention), cumulative
    * counts are exact window sums over the DISTINCT-score cell
    * relation, precision/recall are integral micro divisions, and the
    * winner is a min(struct) election keyed by threshold — every group
    * reports (NULL operating point when no cutoff reaches the target).
    *
    * Output: `(group…, thr_q4, tp, fp, prec_micro, recall_micro)`.
    *
    * Scale: one group shuffle shared by the score-cell aggregation and
    * the cumulative window (the prCurve shape — windows never see raw
    * rows); the election is a plain aggregation.
    */
  def operatingPoint(df: DataFrame, groupCols: Seq[String],
      labelCol: String, scoreCol: String,
      targetPrecisionMicro: Long = 800000L): DataFrame = {
    require(groupCols.nonEmpty, "operatingPoint needs group columns")
    val g = groupCols.map(col)
    val cells = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(g ++ Seq(floor(col(scoreCol) * 10000).cast("long").as("thr_q4"),
        when(col(labelCol), 1L).otherwise(0L).as("_op_y")): _*)
      .groupBy(g :+ col("thr_q4"): _*)
      .agg(count(lit(1)).as("_op_n"), sum(col("_op_y")).as("_op_p"))
    val desc = Window.partitionBy(g: _*).orderBy(col("thr_q4").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(g: _*)
    val scored = cells
      .withColumn("_op_ctp", sum(col("_op_p")).over(desc))
      .withColumn("_op_cn", sum(col("_op_n")).over(desc))
      .withColumn("_op_tp", sum(col("_op_p")).over(all))
      .withColumn("prec_micro", expr("(_op_ctp * 1000000) div _op_cn"))
      .withColumn("recall_micro", when(col("_op_tp") > 0L,
        expr("(_op_ctp * 1000000) div _op_tp")))
    val elect = scored.filter(col("prec_micro") >= targetPrecisionMicro &&
        col("_op_tp") > 0L)
      .groupBy(g: _*)
      .agg(min(struct(col("thr_q4"), (col("_op_ctp")).as("tp"),
        (col("_op_cn") - col("_op_ctp")).as("fp"),
        col("prec_micro"), col("recall_micro"))).as("_op_e"))
    val groups = cells.select(g: _*).distinct()
    groups.join(elect, groupCols, "left")
      .select(g ++ Seq(col("_op_e.thr_q4").as("thr_q4"),
        col("_op_e.tp").as("tp"), col("_op_e.fp").as("fp"),
        col("_op_e.prec_micro").as("prec_micro"),
        col("_op_e.recall_micro").as("recall_micro")): _*)
  }

  /** Subclassification (stratified-adjustment) treatment-effect estimate
    * per group — the causal companion to [[diffInDiff]]/[[cuped]] when
    * the confounder is OBSERVED: stratify on the covariate, difference
    * the arms within each stratum, and size-weight the per-stratum
    * differences (Cochran '68 — five strata remove ~90% of the bias of
    * the crude comparison):
    *
    *   ATE = Σ_s n_s · (ȳ_T,s − ȳ_C,s) / Σ_s n_s     (valid strata only)
    *
    * Strata are `ntile(nStrata)` over a TOTAL order (covariate, id —
    * the liftDeciles rule); each arm mean is an exact integral micro
    * division of decimal sums over 10⁻⁴-quantized y; the weighted
    * average is one more integral division. Strata missing an arm are
    * excluded (and counted out of the denominator). Groups with no
    * valid stratum report NULL.
    *
    * Output: `(group…, n, n_strata_used, ate_micro_q4)`. The unit is
    * MICRO-QUANTA: y quantizes to 10⁻⁴ y-units first, then means take
    * a 10⁶ micro division, so `ate_micro_q4` is the ATE in 10⁻¹⁰
    * y-units (an ATE of 15 y-units reads 15·10¹⁰) — named `_q4` to
    * keep the repo's `*_micro` = 10⁻⁶-of-input convention honest.
    *
    * Scale: one group shuffle for the ntile window, then a strictly
    * reducing (group, stratum) aggregation; the ATE arithmetic runs on
    * the ≤nStrata cell relation.
    */
  def subclassifiedAte(df: DataFrame, groupCols: Seq[String], idCol: String,
      armCol: String, xCol: String, yCol: String,
      nStrata: Int = 5): DataFrame = {
    require(groupCols.nonEmpty, "subclassifiedAte needs group columns")
    require(nStrata > 0, "subclassifiedAte needs positive nStrata")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val rows = df.filter(col(yCol).isNotNull && col(armCol).isNotNull &&
        col(xCol).isNotNull)
      .select(g ++ Seq(col(idCol).as("_sa_id"), col(armCol).as("_sa_t"),
        col(xCol).cast("long").as("_sa_x"),
        floor(col(yCol) * 10000).cast("long").as("_sa_y")): _*)
    val strat = rows.withColumn("_sa_s",
      ntile(nStrata).over(Window.partitionBy(g: _*)
        .orderBy(col("_sa_x"), col("_sa_id"))).cast("long"))
    val cells = strat.groupBy(g :+ col("_sa_s"): _*).agg(
      sum(when(col("_sa_t"), 1L).otherwise(0L)).as("_sa_nt"),
      sum(when(col("_sa_t"), col("_sa_y")).otherwise(lit(0L)).cast(dec))
        .as("_sa_st"),
      sum(when(!col("_sa_t"), 1L).otherwise(0L)).as("_sa_nc"),
      sum(when(!col("_sa_t"), col("_sa_y")).otherwise(lit(0L)).cast(dec))
        .as("_sa_sc"))
    val valid = col("_sa_nt") > 0L && col("_sa_nc") > 0L
    val diff = expr("(_sa_st * 1000000) div cast(_sa_nt as decimal(38,0))") -
      expr("(_sa_sc * 1000000) div cast(_sa_nc as decimal(38,0))")
    cells
      .withColumn("_sa_diff", when(valid, diff))
      .groupBy(g: _*)
      .agg(sum(col("_sa_nt") + col("_sa_nc")).as("n"),
        sum(when(valid, 1L).otherwise(0L)).as("n_strata_used"),
        sum(when(valid, (col("_sa_nt") + col("_sa_nc")).cast(dec) *
          col("_sa_diff")).otherwise(lit(0L).cast(dec))).as("_sa_w"),
        sum(when(valid, col("_sa_nt") + col("_sa_nc")).otherwise(0L))
          .as("_sa_nu"))
      .select(g ++ Seq(col("n"), col("n_strata_used"),
        when(col("_sa_nu") > 0L,
          expr(s"_sa_w div cast(_sa_nu as $dec)").cast("long"))
          .as("ate_micro_q4")): _*)
  }

  /** Split-conformal calibration per group — the distribution-free
    * prediction-band primitive (Vovk; Angelopoulos–Bates '21): hold out
    * a seeded calibration half, take its ⌈(n_cal+1)·cov⌉-th smallest
    * nonconformity score as the threshold q̂, and report the EMPIRICAL
    * coverage of `score ≤ q̂` on the other half — the "is my model's
    * uncertainty honest?" audit for LLM scoring/abstention pipelines.
    *
    * Deterministic end-to-end: the split is a seeded md5 bit (content
    * hash, not RNG — the CorpusAssembly discipline), scores quantize to
    * 10⁻⁴, q̂ is an ORDER STATISTIC (value multiset-determined — no
    * interpolation), k = ⌈(n+1)·covPct/100⌉ in exact integers, and
    * coverage is one integral micro division. k > n_cal (tiny groups)
    * means the conformal quantile is +∞: NULL q̂, coverage 10⁶.
    *
    * Output: `(group…, n_cal, n_eval, k, qhat_q4, coverage_micro)` —
    * q̂ in 10⁻⁴ score units. EVERY group appears (left-joins from the
    * distinct group relation, the operatingPoint/pettittTest
    * convention): a group whose seeded split leaves the calibration
    * half empty reports n_cal 0 / NULL k and q̂ / coverage 10⁶ (the
    * conformal quantile is +∞), and one with an empty eval half
    * reports n_eval 0 / NULL coverage — so callers can tell "group
    * too small to calibrate" from "group absent".
    *
    * Scale: one group shuffle for the calibration rank window; the
    * |groups|-row q̂ relation broadcasts back onto the eval half. For
    * honest conformal behavior coverage_micro ≈ covPct·10⁴ — drift
    * below it flags score distribution shift between the halves.
    */
  def conformalCalibration(df: DataFrame, groupCols: Seq[String],
      idCol: String, scoreCol: String, covPct: Int = 90,
      seed: String = "conf"): DataFrame = {
    require(groupCols.nonEmpty, "conformalCalibration needs group columns")
    require(covPct > 0 && covPct < 100, "covPct must be in (0, 100)")
    val g = groupCols.map(col)
    // persisted (r19, verdict item #4): the seeded split relation feeds
    // THREE consumers (the calibration half, the eval half, the group
    // list) and each re-ran the source scan + md5 split — the r18
    // persist pattern on a narrow O(N) relation (groups + id + one
    // quantized long + the split flag), MEMORY_AND_DISK so it degrades
    // to spill, never OOM.
    val rows = df.filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .select(g ++ Seq(col(idCol).as("_cc_id"),
        floor(col(scoreCol) * 10000).cast("long").as("_cc_s"),
        (conv(substring(md5(concat(lit(seed + ":"),
          col(idCol).cast("string"))), 1, 4), 16, 10).cast("long") % 2 === 0L)
          .as("_cc_cal")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cal = rows.filter(col("_cc_cal"))
      .withColumn("_cc_rn", row_number().over(
        Window.partitionBy(g: _*).orderBy(col("_cc_s"), col("_cc_id"))))
      .withColumn("_cc_nc", count(lit(1)).over(Window.partitionBy(g: _*)))
      .withColumn("_cc_k",
        expr(s"((_cc_nc + 1) * $covPct + 99) div 100"))
    // qhat persists too: it broadcasts into BOTH the eval aggregation
    // and the final assembly, and without a materialization point each
    // broadcast re-ran the whole calibration window subtree. |groups|
    // rows — trivial.
    val qhat = cal.groupBy(g: _*).agg(
      max(col("_cc_nc")).as("n_cal"), max(col("_cc_k")).as("k"),
      max(when(col("_cc_rn") === col("_cc_k"), col("_cc_s"))).as("qhat_q4"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ev = rows.filter(!col("_cc_cal"))
    val evAgg = ev.join(broadcast(qhat.select(g :+ col("qhat_q4"): _*)),
        groupCols, "left")
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("_cc_s") <= col("qhat_q4"), 1L).otherwise(0L))
          .as("_cc_cov"))
    rows.select(g: _*).distinct()
      .join(broadcast(qhat), groupCols, "left")
      .join(evAgg, groupCols, "left")
      .select(g ++ Seq(
        coalesce(col("n_cal"), lit(0L)).as("n_cal"),
        coalesce(col("n_eval"), lit(0L)).as("n_eval"),
        col("k"), col("qhat_q4"),
        when(coalesce(col("n_eval"), lit(0L)) === 0L, lit(null))
          .when(col("qhat_q4").isNull, lit(1000000L))
          .otherwise(expr("(_cc_cov * 1000000) div n_eval"))
          .cast("long").as("coverage_micro")): _*)
  }

  /** Minimum detectable effect per group — the experiment-design
    * companion to [[welchTTest]]/[[cuped]]: with this metric's variance
    * and n subjects PER ARM, the smallest true lift a two-sided
    * α = 0.05 test detects with 80% power,
    *
    *   MDE = (z₀.₉₇₅ + z₀.₈₀)·√(2σ²/n)
    *
    * Variance comes from the exact cleared-denominator moments on
    * cents-quantized values (`(n·Σy² − (Σy)²) div n²`, the
    * mergeableStats identity); the z-sum is the micro-pinned constant
    * 2 801 585 (1 959 964 + 841 621 — definitional, no inverse-CDF call
    * on either engine), and the output is one fixed IEEE
    * multiply + sqrt, floored to MICRO-CENTS. Groups with n ≤ 1 or zero
    * variance report NULL.
    *
    * Output: `(group…, n, var_cents2, mde_microcents)`.
    *
    * Scale: a pure partial-aggregable groupBy — the [[linearTrend]]
    * shape, one shuffle of |groups| moment rows at any corpus width.
    */
  def minDetectableEffect(df: DataFrame, groupCols: Seq[String],
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "minDetectableEffect needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val agg = df.filter(col(yCol).isNotNull)
      .select(g :+ floor(col(yCol) * 100).cast("long").as("_md_c"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("_md_c").cast(dec)).as("_md_s"),
        sum((col("_md_c").cast(dec) * col("_md_c")).cast(dec)).as("_md_ss"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val v = expr(s"(n * _md_ss - _md_s * _md_s) div (cast(n as $dec) * n)")
    agg
      .withColumn("var_cents2", v)
      .select(g ++ Seq(col("n"), col("var_cents2"),
        when(col("n") > 1L && col("var_cents2") > 0L,
          floor(lit(2801585.0) * sqrt(lit(2.0) * d(col("var_cents2")) /
            d(col("n")))).cast("long")).as("mde_microcents")): _*)
  }

  /** Grouped decile lift table — the "is the model's top decile actually
    * converting?" report that turns a score column into the classic
    * gains chart ([[rocAuc]] tells you ranking skill; this tells you
    * where the conversions concentrate):
    *
    * Entities are tiled into `nTiles` equal buckets by score descending
    * (ntile — both engines implement the SQL-standard first-(n mod b)-
    * buckets-get-one-extra rule) with the id as a total-order tie-break
    * (ntile DOES depend on order within ties, unlike NDCG's weights),
    * then each tile reports its conversion rate and the cumulative
    * lift of tiles 1..i vs the group base rate:
    *
    *   lift_i = (cumConv_i / cumN_i) / (conv / n)
    *          = cumConv_i·n·10⁶ div (cumN_i·conv)      (exact integers)
    *
    * Output: `(group…, tile, n, conv, rate_micro, cum_lift_micro)`;
    * groups with zero conversions report NULL lift.
    *
    * Scale: one group-key shuffle serves the ntile window, the
    * cumulative window, and the aggregation; the lift arithmetic runs
    * on the nTiles-row relation. Entities per group are whatever the
    * upstream entity aggregation produced — already reduced, not raw
    * events.
    */
  def liftDeciles(df: DataFrame, groupCols: Seq[String], idCol: String,
      scoreCol: String, convCol: String, nTiles: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "liftDeciles needs group columns")
    require(nTiles > 0, "liftDeciles needs positive nTiles")
    val g = groupCols.map(col)
    val rows = df.filter(col(scoreCol).isNotNull)
      .select(g ++ Seq(col(idCol).as("_ld_id"),
        floor(col(scoreCol) * 10000).cast("long").as("_ld_s"),
        when(col(convCol), 1L).otherwise(0L).as("_ld_c")): _*)
    val tiled = rows.withColumn("tile",
      ntile(nTiles).over(Window.partitionBy(g: _*)
        .orderBy(col("_ld_s").desc, col("_ld_id"))).cast("long"))
    val cells = tiled.groupBy(g :+ col("tile"): _*).agg(
      count(lit(1)).as("n"), sum(col("_ld_c")).as("conv"))
    val wc = Window.partitionBy(g: _*).orderBy(col("tile"))
    val wg = Window.partitionBy(g: _*)
    cells
      .withColumn("_ld_cn", sum(col("n")).over(wc))
      .withColumn("_ld_cc", sum(col("conv")).over(wc))
      .withColumn("_ld_tn", sum(col("n")).over(wg))
      .withColumn("_ld_tc", sum(col("conv")).over(wg))
      .select(g ++ Seq(col("tile"), col("n"), col("conv"),
        expr("(conv * 1000000) div n").as("rate_micro"),
        when(col("_ld_tc") > 0L,
          expr("(_ld_cc * _ld_tn * 1000000) div (_ld_cn * _ld_tc)"))
          .as("cum_lift_micro")): _*)
  }
}
