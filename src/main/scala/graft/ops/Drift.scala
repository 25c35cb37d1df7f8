package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift scoring between an expected (P) and an actual (Q)
  * slice of the same metric — the monitoring primitive behind "did this
  * week's crawl shift?" / "does the deduped corpus still look like the
  * raw one?" gates: PSI (population stability index,
  * `Σ_b (p_b − q_b)·ln(p_b/q_b)`, the symmetric industry-standard alarm
  * score) and forward KL divergence (`Σ_b p_b·ln(p_b/q_b)`, the
  * information-theoretic view) over a fixed equi-width binning with
  * add-one smoothing, so empty bins never divide by zero and both scores
  * stay finite.
  */
object Drift {

  /** Two-sample Kolmogorov–Smirnov statistic per group — the
    * binning-free companion to [[driftReport]] (PSI/KL answer "how much
    * did the histogram move?"; KS answers "what is the largest CDF gap
    * anywhere?", sensitive to shifts PSI's fixed bins can straddle).
    * `D = max_v |F_A(v) − F_B(v)|` evaluated at every distinct observed
    * value, which is where the max must occur.
    *
    * Exact end-to-end: values quantize to 10⁻⁴ longs (definitional, the
    * welchTTest floor), per-value arm counts accumulate into running
    * cumulative longs over the pinned value order, the gap clears
    * denominators — `|cumA·n_B − cumB·n_A|` in decimal(38,0) — and the
    * reported `ks_micro = (maxGap·10⁶) div (n_A·n_B)` is ONE integral
    * division. No doubles anywhere, so the DuckDB oracle is the same
    * arithmetic verbatim. An empty arm reports NULL.
    *
    * Scale: one hash shuffle onto (group, value) cells with map-side
    * partials bounds the sort: the running-cumulative window orders the
    * per-group DISTINCT-value relation (≤ |distinct quantized values|
    * rows, not raw rows), then one partial-aggregable max. Same skew
    * story as any grouped window — AQE splits, rank state spills.
    */
  def ksTest(df: DataFrame, groupCols: Seq[String], armCol: String,
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "ksTest needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val cells = df
      .filter(col(valueCol).isNotNull && col(armCol).isNotNull)
      .select(g ++ Seq(col(armCol).as("_ks_a"),
        floor(col(valueCol) * 10000).cast("long").as("_ks_v")): _*)
      .groupBy(g :+ col("_ks_v"): _*)
      .agg(sum(when(col("_ks_a"), 1L).otherwise(0L)).as("_ks_ca"),
        sum(when(!col("_ks_a"), 1L).otherwise(0L)).as("_ks_cb"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("_ks_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    cells
      .withColumn("_ks_cuma", sum(col("_ks_ca")).over(wCum))
      .withColumn("_ks_cumb", sum(col("_ks_cb")).over(wCum))
      .withColumn("n_a", sum(col("_ks_ca")).over(wTot))
      .withColumn("n_b", sum(col("_ks_cb")).over(wTot))
      .withColumn("_ks_gap",
        abs(col("_ks_cuma").cast(dec) * col("n_b").cast(dec) -
          col("_ks_cumb").cast(dec) * col("n_a").cast(dec)))
      .groupBy(g: _*)
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        max(col("_ks_gap")).as("_ks_max"))
      .select(g ++ Seq(col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          expr("(_ks_max * 1000000) div " +
            "(cast(n_a as decimal(38,0)) * n_b)")).as("ks_micro")): _*)
  }

  /** Per-group PSI + KL between the rows where `expectedCol` is true (P,
    * the reference window) and false (Q, the comparison window), binning
    * `valueCol` into `nBins` equi-width bins of `binWidth` (values at or
    * beyond the last edge clamp into the last bin; negatives into the
    * first). Returns `(groupCols*, n_p, n_q, psi_micro, kl_micro)` in
    * integer micro-nats.
    *
    * Deterministic cross-engine by exact integer accumulation: with
    * smoothed masses `p_b = (c^P_b+1)/(N_P+B)` and
    * `q_b = (c^Q_b+1)/(N_Q+B)` (B = nBins), clearing denominators gives
    * `PSI·D = Σ_b (w^P_b − w^Q_b)·ln(w^P_b/w^Q_b)` with
    * `w^P_b = (c^P_b+1)(N_Q+B)`, `w^Q_b = (c^Q_b+1)(N_P+B)`,
    * `D = (N_P+B)(N_Q+B)` — the log argument collapses to the SAME
    * `w^P/w^Q` ratio, quantized once per bin to micro-nats by the corpus
    * ln rule (`round(ln·10⁶)` — the only libm call, absorbed by the
    * rounding). The per-bin summands are then exact integer products
    * accumulated in decimal(38,0) (order-independent, unlike float
    * sums), and each reported score is ONE final double division:
    * `psi_micro = ⌊Σ/D⌋`, `kl_micro = ⌊Σ_b (c^P_b+1)·ln_b / (N_P+B)⌋`.
    * ALL B bins contribute (smoothing is over the fixed binning, so a
    * bin empty on both sides still carries mass 1/(N+B) on each) — the
    * bin frame is completed per group before scoring. Beyond ~2⁵³ row
    * counts per side the w ratios should route through decimal division
    * before the ln (same caveat as pmiCollocations).
    *
    * Scale: one hash shuffle of the raw rows onto (group, bin) cells
    * with map-side partials; everything after — bin completion
    * (groups × B explode), totals join, scoring — operates on the
    * |groups|·B cell relation, tiny regardless of corpus size.
    */
  def driftReport(df: DataFrame, groupCols: Seq[String], valueCol: String,
      expectedCol: String, binWidth: Double, nBins: Int): DataFrame = {
    require(groupCols.nonEmpty, "driftReport needs group columns")
    require(binWidth > 0 && nBins > 0, "driftReport needs positive binning")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val (full, totals) = binnedCells(df, groupCols, valueCol, expectedCol,
      binWidth, nBins)
    val b = lit(nBins.toLong)
    val wp = (col("_dr_cp") + 1L).cast(dec) * (col("n_q") + b).cast(dec)
    val wq = (col("_dr_cq") + 1L).cast(dec) * (col("n_p") + b).cast(dec)
    val lnMicro = round(
      log(wp.cast("double") / wq.cast("double")) * 1e6).cast("long")
    val scored = full.join(totals, groupCols)
      .withColumn("_dr_wp", wp)
      .withColumn("_dr_wq", wq)
      .withColumn("_dr_ln", lnMicro)
    scored.groupBy(g: _*).agg(
        first(col("n_p")).as("n_p"), first(col("n_q")).as("n_q"),
        sum((col("_dr_wp") - col("_dr_wq")) * col("_dr_ln").cast(dec))
          .as("_dr_s"),
        sum((col("_dr_cp") + 1L).cast(dec) * col("_dr_ln").cast(dec))
          .as("_dr_k"))
      .select(g ++ Seq(col("n_p"), col("n_q"),
        floor(col("_dr_s").cast("double") /
          (((col("n_p") + b) * (col("n_q") + b)).cast("double")))
          .cast("long").as("psi_micro"),
        floor(col("_dr_k").cast("double") /
          (col("n_p") + b).cast("double")).cast("long").as("kl_micro")): _*)
  }

  /** Shared binned-cell skeleton of [[driftReport]] and [[jsDivergence]]:
    * `valueCol` equi-width-binned into `(group, bin)` cells carrying
    * per-arm counts (`_dr_cp` where `expectedCol` is true, `_dr_cq`
    * otherwise), the bin frame COMPLETED per group (smoothing is over the
    * fixed binning, so a bin empty on both sides still carries its +1
    * mass), plus the per-group arm totals `(n_p, n_q)`.
    *
    * The cell relation is lazily persisted (lineage kept, the Dedup-frame
    * contract): it feeds the group list, the bin completion, and the
    * totals — without it each branch re-scans the raw table.
    */
  private def binnedCells(df: DataFrame, groupCols: Seq[String],
      valueCol: String, expectedCol: String, binWidth: Double,
      nBins: Int): (DataFrame, DataFrame) = {
    val g = groupCols.map(col)
    val bin = least(greatest(floor(col(valueCol) / binWidth), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    val cells = df
      .filter(col(valueCol).isNotNull && col(expectedCol).isNotNull)
      .groupBy(g :+ bin.as("_dr_b"): _*)
      .agg(sum(when(col(expectedCol), 1L).otherwise(0L)).as("_dr_cp"),
        sum(when(!col(expectedCol), 1L).otherwise(0L)).as("_dr_cq"))
      .persist()
    val full = cells.select(g: _*).distinct()
      .select(g :+ explode(sequence(lit(0L), lit((nBins - 1).toLong)))
        .as("_dr_b"): _*)
      .join(cells, groupCols :+ "_dr_b", "left")
      .na.fill(0L, Seq("_dr_cp", "_dr_cq"))
    val totals = cells.groupBy(g: _*).agg(
      sum(col("_dr_cp")).as("n_p"), sum(col("_dr_cq")).as("n_q"))
    (full, totals)
  }

  /** Per-group Jensen–Shannon divergence between the `expectedCol`-true
    * (P) and -false (Q) arms of `valueCol` under the same equi-width
    * binning and add-one smoothing as [[driftReport]] — the BOUNDED drift
    * score (`0 ≤ JSD ≤ ln 2`, symmetric, finite even on disjoint
    * supports) that completes the drift family: PSI alarms, KL orients,
    * KS localizes, JSD compares corpora on an absolute scale. Returns
    * `(groupCols*, n_p, n_q, js_micro)` in integer micro-nats.
    *
    * Deterministic cross-engine by the [[driftReport]] arithmetic: with
    * cleared-denominator masses `w^P_b = (c^P_b+1)(N_Q+B)` and
    * `w^Q_b = (c^Q_b+1)(N_P+B)` over common denominator
    * `D = (N_P+B)(N_Q+B)`, the mixture ratio collapses to
    * `p_b/m_b = 2·w^P_b/(w^P_b+w^Q_b)` — each of the two per-bin logs is
    * quantized once to micro-nats by the corpus ln rule, the summands
    * `w^P_b·ln_p + w^Q_b·ln_q` are exact integer products accumulated in
    * decimal(38,0), and the reported score is ONE final double division
    * `js_micro = ⌊Σ/(2D)⌋`.
    *
    * Scale: identical to [[driftReport]] — one hash shuffle of raw rows
    * onto (group, bin) cells with map-side partials; scoring runs on the
    * |groups|·B cell relation.
    */
  def jsDivergence(df: DataFrame, groupCols: Seq[String], valueCol: String,
      expectedCol: String, binWidth: Double, nBins: Int): DataFrame = {
    require(groupCols.nonEmpty, "jsDivergence needs group columns")
    require(binWidth > 0 && nBins > 0, "jsDivergence needs positive binning")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    val (full, totals) = binnedCells(df, groupCols, valueCol, expectedCol,
      binWidth, nBins)
    val b = lit(nBins.toLong)
    val wp = (col("_dr_cp") + 1L).cast(dec) * (col("n_q") + b).cast(dec)
    val wq = (col("_dr_cq") + 1L).cast(dec) * (col("n_p") + b).cast(dec)
    val lnP = round(log(lit(2.0) * col("_js_wp").cast("double") /
      (col("_js_wp") + col("_js_wq")).cast("double")) * 1e6).cast("long")
    val lnQ = round(log(lit(2.0) * col("_js_wq").cast("double") /
      (col("_js_wp") + col("_js_wq")).cast("double")) * 1e6).cast("long")
    full.join(totals, groupCols)
      .withColumn("_js_wp", wp)
      .withColumn("_js_wq", wq)
      .groupBy(g: _*)
      .agg(first(col("n_p")).as("n_p"), first(col("n_q")).as("n_q"),
        sum(col("_js_wp") * lnP.cast(dec) + col("_js_wq") * lnQ.cast(dec))
          .as("_js_s"))
      .select(g ++ Seq(col("n_p"), col("n_q"),
        floor(col("_js_s").cast("double") /
          (((col("n_p") + b) * (col("n_q") + b) * lit(2L)).cast("double")))
          .cast("long").as("js_micro")): _*)
  }

  /** Benford first-significant-digit screen over a positive amount
    * column — the fabrication/data-quality test run on financial and
    * count-like fields: natural multiplicative data follows
    * `P(d) = log10(1 + 1/d)`; a flat or spiked first-digit histogram
    * flags synthetic or truncated values. Returns one row per digit
    * 1–9: `(digit, cnt, share_micro, benford_micro, dev_micro)`.
    *
    * Deterministic cross-engine: values quantize to integer units by
    * `⌊v·scale⌋` (IEEE double multiply + floor, bit-identical on both
    * engines even at representation boundaries), the first digit is read
    * off the LONG's decimal rendering (exact — never a data-dependent
    * log10), shares are integral `cnt·10⁶ div N` divisions, and the
    * Benford expectations are the nine DEFINITIONAL micro-unit constants
    * hard-coded on both sides (no libm call anywhere in the plan).
    * Non-positive and null values are excluded (Benford is defined on
    * positive magnitudes).
    *
    * Scale: one hash shuffle onto ≤9 digit cells with map-side partials;
    * everything downstream is a 9-row relation.
    */
  def benfordDigits(df: DataFrame, valueCol: String,
      scale: Long = 100L): DataFrame = {
    require(scale > 0, "benfordDigits needs a positive scale")
    // round(log10(1 + 1/d) · 10⁶) for d = 1..9 — definitional constants
    val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    val units = df
      .filter(col(valueCol).isNotNull)
      .select(floor(col(valueCol) * scale).cast("long").as("_bf_u"))
      .filter(col("_bf_u") > 0L)
    val counts = units
      .select(substring(col("_bf_u").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("cnt"))
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val total = counts.agg(sum(col("cnt")).as("_bf_n"))
    digits.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("cnt"),
        when(col("_bf_n") > 0L, expr("cnt * 1000000 div _bf_n"))
          .otherwise(lit(0L)).as("share_micro"),
        element_at(array(benford.map(lit): _*), col("digit"))
          .as("benford_micro"))
      .withColumn("dev_micro",
        abs(col("share_micro") - col("benford_micro")))
  }
}
