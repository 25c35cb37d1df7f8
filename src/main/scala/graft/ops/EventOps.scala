package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics: ordered-step funnels and cohort retention —
  * the two aggregate shapes every product-analytics workload runs over an
  * events table, expressed as equi-joins + hash aggregations so the plans
  * scale like any other keyed pipeline (no self-windows over raw events).
  */
object EventOps {

  /** Ordered-step funnel: step 1 is each user's first `steps(0)` event;
    * step k+1 is their first `steps(k)` event AT OR AFTER their step-k
    * time. Returns one row per step: (step_idx, step, n_users) — the
    * strictly-ordered "view → click → purchase" conversion counts, which
    * a naive per-type count overstates (events out of order don't
    * convert).
    *
    * Scale: each stage is filter → shuffle on user → min aggregation —
    * per-stage shuffle carries one (user, ts) pair per qualifying event;
    * the per-step counts are scalar aggregates. Stage k's frame is at
    * most the funnel survivors, so work shrinks monotonically.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // Each stage persists (one narrow (user, ts) row per surviving
    // user): stage k feeds BOTH stage k+1's join and its own count —
    // unpersisted, counting stage k re-executed every earlier stage's
    // scan+join chain, so a k-step funnel paid 1+2+…+k source scans
    // (r18: final plan showed 6 scans for 3 steps; k is the floor, one
    // filtered pass per step). Released via clearCache.
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
      .persist()
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col(typeCol) === step)
        .select(col(userCol).as("_fu"), col(tsCol).as("_fts"))
        .join(prev, col("_fu") === col("u") && col("_fts") >= col("t"))
        .groupBy(col("_fu"))
        .agg(min(col("_fts")).as("t"))
        .select(col("_fu").as("u"), col("t"))
        .persist()
    }
    stages.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step_idx"), lit(step).as("step"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by the calendar day of their first
    * event; for every (cohort day, day offset) the number of cohort
    * members active that many days later. The day-grain activity set is
    * deduplicated BEFORE the join, so the matrix aggregation sees one row
    * per (user, day), not per event.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val firstDay = events.groupBy(col(userCol).as("u"))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    val activity = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    activity.join(firstDay, "u")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("long").as("day_offset"), col("n_users"))
  }

  /** SCD-2 history build: turn a change feed `(key, ts, attr)` into
    * validity intervals `(key, attr, valid_from, valid_to, is_current)`.
    * True type-2 semantics, not just a lead() pass: consecutive records
    * whose attribute is UNCHANGED collapse into one interval first (a
    * feed that re-states the same value must not fragment history), then
    * each surviving change closes at the next change's timestamp;
    * the last interval per key is open (`valid_to` NULL, is_current).
    * Ordering inside a key is `ts` with `tieCol` as the deterministic
    * tiebreak for equal timestamps.
    *
    * This is the snapshot-reconstruction operator next to
    * [[graft.SparkEntry]]'s `q_latest_snapshot` (SCD-1): the as-of state
    * of any entity is the single interval with
    * `valid_from <= t < coalesce(valid_to, +inf)` — a range-join probe,
    * no replay of the feed.
    *
    * Scale shape: two windows over the same `(key)` partitioning — one
    * hash shuffle on the key, both sorts reuse it (Spark collapses the
    * exchange). No join, no global sort; per-key state is the key's own
    * change count, so skew follows the feed's hottest entity, the same
    * bound as the continuation-merge window.
    */
  def scd2Intervals(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = events
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .withColumn("_prevTs", lag(col(tsCol), 1).over(w))
      // keep the first record and every real change; <=> is null-safe so
      // a NULL attribute forms (and terminates) intervals like any value
      .filter(col("_prevTs").isNull || !(col(attrCol) <=> col("_prev")))
      .drop("_prev", "_prevTs")
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_to_ts", lead(col(tsCol), 1).over(w2))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from_ts"), col("valid_to_ts"),
        col("valid_to_ts").isNull.as("is_current"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * `(from_type, to_type, n_transitions, p_micro)` where `p_micro` is
    * the row-conditional probability P(to | from) in integer 10⁻⁶ units
    * (exact integral division — bit-stable, no float ratios). The
    * next-step behavioral model behind "what usually follows a
    * page_view" questions and sequence-anomaly screens.
    *
    * Order within a user is `(ts, tie)` — deterministic under timestamp
    * ties. Scale: ONE (user) shuffle for the lead window (sequences are
    * per-user, never global), a (from, to) hash agg with map-side
    * partials, and the row-normalizing window runs over the aggregated
    * |event-type vocabulary|² relation — cardinality-bounded, not
    * data-bounded.
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val counts = events
      .withColumn("_tm_next", lead(col(typeCol), 1).over(w))
      .filter(col("_tm_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_tm_next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    counts
      .withColumn("_tm_tot", sum(col("n_transitions")).over(wf))
      .withColumn("p_micro", expr("(n_transitions * 1000000) div _tm_tot"))
      .drop("_tm_tot")
  }

  /** Regularize an irregular event stream onto a dense per-key daily
    * grid with forward fill — the resampling step before any
    * fixed-step time-series math (moving averages, drift windows,
    * day-over-day joins) that silently breaks on gap days. Per key:
    * observations collapse to one value per day (LATEST in the day
    * wins — max(struct(ts, value)) election, value breaking exact-ts
    * ties; the same deterministic-election shape as snapshotDiff), the
    * grid spans that key's own min..max day (no global frame — a key
    * that appeared for a week doesn't emit a year of rows), and gap
    * days carry the last observed value forward. Values quantize to
    * 10⁻⁶ longs at ingestion (floor of the stored double — carried,
    * never recomputed), so the filled series is hash-stable.
    * Returns `(keyCols*, day, value_micro, is_observed)`; days before
    * a key's first observation cannot exist by construction, so the
    * fill never emits NULL.
    *
    * Scale: one (key, day) hash aggregation with map-side partials
    * bounds everything downstream at |keys|·|days| cells; the span
    * aggregate, grid explode (sequence per key — |days| ≤ retention
    * window, safe fan-out), and the forward-fill window all run on
    * that cell relation, never the raw events. The fill window sorts
    * per key — AQE splits a skewed key's partition.
    */
  def gapFill(events: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "gapFill needs key columns")
    val g = keyCols.map(col)
    // Lazy persist (the Dedup-frames contract): the day cells feed the
    // span aggregate AND the grid join.
    val cells = events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(g ++ Seq(to_date(col(tsCol)).as("day"),
        struct(col(tsCol).as("_gf_ts"),
          floor(col(valueCol) * 1000000).cast("long").as("_gf_v"))
          .as("_gf_obs")): _*)
      .groupBy(g :+ col("day"): _*)
      .agg(max(col("_gf_obs")).getField("_gf_v").as("_gf_day_v"))
      .persist()
    val grid = cells.groupBy(g: _*)
      .agg(min(col("day")).as("_gf_d0"), max(col("day")).as("_gf_d1"))
      .select(g :+ explode(sequence(col("_gf_d0"), col("_gf_d1"),
        expr("interval 1 day"))).as("day"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(cells, keyCols :+ "day", "left")
      .withColumn("value_micro",
        last(col("_gf_day_v"), ignoreNulls = true).over(w))
      .withColumn("is_observed", col("_gf_day_v").isNotNull)
      .select(g ++ Seq(col("day"), col("value_micro"), col("is_observed")): _*)
  }

  /** One-sided CUSUM changepoint screen (Page '54) over the daily mean
    * of `valueCol` per key: `S_t = max(0, S_{t−1} + (x_t − k))` with
    * alarm when `S_t > h` — the sequential drift detector that catches
    * a sustained small upward shift long before a per-day threshold
    * would. The recursion is NOT window-expressible directly, but its
    * closed form is: `S_t = C_t − min_{j≤t} C_j` where
    * `C_t = Σ_{i≤t}(x_i − k)` — a running sum minus its running
    * minimum, two frames over one (key, day) sort. `k` (reference) and
    * `h` (decision interval) are in cents.
    *
    * All-integer: daily means are `sum-of-cents div count` (values
    * quantize to cents BEFORE summing), both windows run over exact
    * longs — the whole trajectory hash-oracles.
    *
    * Scale: the day aggregation is one hash shuffle with map-side
    * partials; both windows share one per-key sort over the ≤|days|
    * cell relation, never the raw events.
    */
  def cusum(events: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, kCents: Long, hCents: Long): DataFrame = {
    require(keyCols.nonEmpty, "cusum needs key columns")
    val g = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(g ++ Seq(to_date(col(tsCol)).as("day"),
        floor(col(valueCol) * 100).cast("long").as("_cs_c")): _*)
      .groupBy(g :+ col("day"): _*)
      .agg(count(lit(1)).as("n"), sum(col("_cs_c")).as("_cs_sum"))
      .withColumn("x_cents", expr("_cs_sum div n"))
      .withColumn("_cs_cum", sum(col("x_cents") - kCents).over(w))
      .withColumn("s_cents", col("_cs_cum") - min(col("_cs_cum")).over(w))
      .withColumn("alarm", col("s_cents") > hCents)
      .select(g ++ Seq(col("day"), col("n"), col("x_cents"),
        col("s_cents"), col("alarm")): _*)
  }

  /** Exponentially-weighted moving average (α = 1/2) of the daily mean
    * of `valueCol` per key, truncated to the last `lags` observations
    * and self-normalizing over what's available:
    * `ewma_t = (Σ_{j<m} x_{t−j}·2^{m−1−j}) / (2^m − 1)` with
    * `m = min(t+1, lags)` — the trend smoother that discounts history
    * geometrically where [[cusum]] accumulates it linearly.
    *
    * α is pinned at 1/2 deliberately: powers of two keep every weight
    * an exact integer (`1 << j`), so the weighted sum is exact long
    * arithmetic and one final integral `div` by the closed-form
    * normalizer — no float powers (libm `pow` is engine-divergent),
    * and the whole trajectory hash-oracles. A general-α EWMA would be
    * float-recursive and only spec-checkable.
    *
    * Scale: the day aggregation is the only data-sized shuffle; the
    * frame `collect_list` holds ≤`lags` longs per row of the ≤|days|
    * cell relation — bounded state, same cost class as any windowed
    * moving average.
    */
  def ewma(events: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, lags: Int = 16): DataFrame = {
    require(keyCols.nonEmpty, "ewma needs key columns")
    require(lags > 0 && lags <= 62, "lags must fit a long shift")
    val g = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("day"))
      .rowsBetween(-(lags - 1), 0)
    events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(g ++ Seq(to_date(col(tsCol)).as("day"),
        floor(col(valueCol) * 100).cast("long").as("_ew_c")): _*)
      .groupBy(g :+ col("day"): _*)
      .agg(count(lit(1)).as("n"), sum(col("_ew_c")).as("_ew_sum"))
      .withColumn("x_cents", expr("_ew_sum div n"))
      // chronological frame: index i (0 = oldest in frame) weighs 2^i
      .withColumn("_ew_arr", collect_list(col("x_cents")).over(w))
      .withColumn("ewma_cents", expr(
        """aggregate(
          |  zip_with(_ew_arr, sequence(0, size(_ew_arr) - 1),
          |    (v, i) -> v * shiftleft(1L, i)),
          |  0L, (acc, x) -> acc + x)
          |div (shiftleft(1L, size(_ew_arr)) - 1)""".stripMargin))
      .select(g ++ Seq(col("day"), col("x_cents"), col("ewma_cents")): _*)
  }

  /** Day-of-week seasonal index per key: each weekday's mean value as a
    * micro-ratio of the key's overall mean —
    * `idx = (S_d·N) · 10⁶ div (n_d·S)` with both denominators cleared
    * into ONE integral division over exact cents sums (never a
    * mean-of-means, which would weight days equally regardless of
    * volume). 10⁶ = flat; >10⁶ = that weekday runs hot.
    *
    * Scale: one hash aggregation onto (key, dow) cells with map-side
    * partials; the overall sums come from a window over the ≤7-row
    * cell relation per key, not a second scan.
    */
  def seasonalIndex(events: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "seasonalIndex needs key columns")
    val g = keyCols.map(col)
    val gw = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(g ++ Seq(dayofweek(col(tsCol)).cast("long").as("dow"),
        floor(col(valueCol) * 100).cast("long").as("_si_c")): _*)
      .groupBy(g :+ col("dow"): _*)
      .agg(count(lit(1)).as("n"), sum(col("_si_c")).as("_si_s"))
      .withColumn("_si_tn", sum(col("n")).over(gw))
      .withColumn("_si_ts", sum(col("_si_s")).over(gw))
      .select(g ++ Seq(col("dow"), col("n"),
        expr("_si_s div n").as("mean_cents"),
        expr("case when _si_ts > 0 then (_si_s * _si_tn * 1000000)" +
          " div (n * _si_ts) end").as("idx_micro")): _*)
      .filter(col("idx_micro").isNotNull)
  }

  /** Sample autocorrelation (ACF) of an integer-valued series at lags
    * `1..maxLag` — the seasonality/memory screen run before anyone
    * trusts a forecast or picks a seasonal period:
    * `r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ_t(x_t−x̄)²`.
    *
    * `df` must already be ONE ROW PER (key, order position) — a daily
    * aggregate, typically; the series index is the ORDER of `orderCol`
    * within each key (gaps in the index are the caller's modeling
    * choice — [[gapFill]] first to treat absent days as zeros).
    *
    * Denominators are cleared by n² so every moment is an exact integer:
    * `num_k = n²·P_k − n·S·(A_k+B_k) + (n−k)·S²` and
    * `den = n²·SS − n·S²` over exact decimal(38,0) sums, where
    * `P_k = Σ x_t·x_{t+k}`, `A_k/B_k` the lagged-overlap sums of
    * x_t / x_{t+k} — all aggregable WITHOUT knowing the mean, so the
    * whole ACF is one window pass + one hash aggregation. The final
    * `⌊num·10⁶/den⌋` is two correctly-rounded IEEE ops (the Spearman
    * discipline) — hash-stable across engines. One row per (key, lag):
    * `(key…, lag, n, acf_micro)`; NULL when the series is constant
    * (den = 0) or shorter than the lag.
    *
    * Scale: the lead() window and the aggregation share one shuffle on
    * the key columns; state per group is `2·maxLag + 3` sums, never the
    * series. maxLag lags ride ONE sort, not maxLag self-joins.
    */
  def acf(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, maxLag: Int = 5): DataFrame = {
    require(keyCols.nonEmpty, "acf needs key columns")
    require(maxLag >= 1 && maxLag <= 32, "acf needs 1 <= maxLag <= 32")
    val g = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col(orderCol))
    val dec = "decimal(38,0)"
    val lagged = (1 to maxLag).foldLeft(
        df.filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
          .withColumn("_ac_x", col(valueCol).cast("long"))) {
      case (cur, k) =>
        cur.withColumn(s"_ac_l$k", lead(col("_ac_x"), k).over(w))
    }
    val aggExprs: Seq[org.apache.spark.sql.Column] = Seq(
      count(lit(1)).cast(dec).as("_ac_n"),
      sum(col("_ac_x").cast(dec)).as("_ac_s"),
      sum((col("_ac_x") * col("_ac_x")).cast(dec)).as("_ac_ss")) ++
      (1 to maxLag).flatMap { k =>
        val lk = col(s"_ac_l$k")
        Seq(
          coalesce(sum((col("_ac_x") * lk).cast(dec)), lit(0).cast(dec))
            .as(s"_ac_p$k"),
          coalesce(sum(when(lk.isNotNull, col("_ac_x")).cast(dec)),
            lit(0).cast(dec)).as(s"_ac_a$k"),
          coalesce(sum(lk.cast(dec)), lit(0).cast(dec)).as(s"_ac_b$k"))
      }
    val moments = lagged.groupBy(g: _*).agg(aggExprs.head, aggExprs.tail: _*)
    val perLag = (1 to maxLag).map { k =>
      val num = col("_ac_n") * col("_ac_n") * col(s"_ac_p$k") -
        col("_ac_n") * col("_ac_s") * (col(s"_ac_a$k") + col(s"_ac_b$k")) +
        (col("_ac_n") - lit(k)) * col("_ac_s") * col("_ac_s")
      val den = col("_ac_n") * col("_ac_n") * col("_ac_ss") -
        col("_ac_n") * col("_ac_s") * col("_ac_s")
      struct(lit(k).as("lag"),
        when(den > 0 && col("_ac_n") > k,
          floor(num.cast("double") * lit(1000000.0) / den.cast("double"))
            .cast("long")).as("acf_micro"))
    }
    moments.select(g ++ Seq(col("_ac_n").cast("long").as("n"),
        explode(array(perLag: _*)).as("_ac_e")): _*)
      .select(g ++ Seq(col("_ac_e.lag").as("lag"), col("n"),
        col("_ac_e.acf_micro").as("acf_micro")): _*)
  }

  /** Sample cross-correlation (CCF) between two integer-valued series
    * at lags `0..maxLag` — the lead/lag predictor screen ("do sign-ups
    * lead purchases by k days?"): at lag k,
    * `r_k = Σ_{t≤n−k}(x_t−x̄)(y_{t+k}−ȳ) / √(Σ(x−x̄)²·Σ(y−ȳ)²)`.
    * Positive k means x LEADS y by k steps. Lag 0 is the plain Pearson
    * correlation of the two series.
    *
    * Same cleared-denominator discipline as [[acf]]: per lag the exact
    * integer moments `P_k = Σx_t·y_{t+k}`, overlap sums `A_k/B_k`, and
    * `num_k = n²P_k − n·S_y·A_k − n·S_x·B_k + (n−k)·S_x·S_y`; the
    * denominator √(D_x·D_y) uses full-series scatter. Final value =
    * `⌊num·10⁶/√(D_x·D_y)⌋` (multiply, sqrt, divide, floor — each
    * correctly-rounded IEEE), so rows hash-oracle. One row per
    * (key, lag): `(key…, lag, n, ccf_micro)`; NULL when either series
    * is constant or shorter than the lag.
    *
    * Scale: identical to [[acf]] — one key-partitioned window sort
    * shared by all lags, one hash aggregation of `2·(maxLag+1) + 5`
    * sums per group.
    */
  def ccf(df: DataFrame, keyCols: Seq[String], orderCol: String,
      xCol: String, yCol: String, maxLag: Int = 5): DataFrame = {
    require(keyCols.nonEmpty, "ccf needs key columns")
    require(maxLag >= 0 && maxLag <= 32, "ccf needs 0 <= maxLag <= 32")
    val g = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col(orderCol))
    val dec = "decimal(38,0)"
    val lagged = (0 to maxLag).foldLeft(
        df.filter(col(orderCol).isNotNull && col(xCol).isNotNull &&
            col(yCol).isNotNull)
          .withColumn("_cc_x", col(xCol).cast("long"))
          .withColumn("_cc_y", col(yCol).cast("long"))) {
      case (cur, k) =>
        cur.withColumn(s"_cc_l$k", lead(col("_cc_y"), k).over(w))
    }
    val aggExprs: Seq[org.apache.spark.sql.Column] = Seq(
      count(lit(1)).cast(dec).as("_cc_n"),
      sum(col("_cc_x").cast(dec)).as("_cc_sx"),
      sum(col("_cc_y").cast(dec)).as("_cc_sy"),
      sum((col("_cc_x") * col("_cc_x")).cast(dec)).as("_cc_ssx"),
      sum((col("_cc_y") * col("_cc_y")).cast(dec)).as("_cc_ssy")) ++
      (0 to maxLag).flatMap { k =>
        val lk = col(s"_cc_l$k")
        Seq(
          coalesce(sum((col("_cc_x") * lk).cast(dec)), lit(0).cast(dec))
            .as(s"_cc_p$k"),
          coalesce(sum(when(lk.isNotNull, col("_cc_x")).cast(dec)),
            lit(0).cast(dec)).as(s"_cc_a$k"),
          coalesce(sum(lk.cast(dec)), lit(0).cast(dec)).as(s"_cc_b$k"))
      }
    val moments = lagged.groupBy(g: _*).agg(aggExprs.head, aggExprs.tail: _*)
    val dx = col("_cc_n") * col("_cc_n") * col("_cc_ssx") -
      col("_cc_n") * col("_cc_sx") * col("_cc_sx")
    val dy = col("_cc_n") * col("_cc_n") * col("_cc_ssy") -
      col("_cc_n") * col("_cc_sy") * col("_cc_sy")
    val perLag = (0 to maxLag).map { k =>
      val num = col("_cc_n") * col("_cc_n") * col(s"_cc_p$k") -
        col("_cc_n") * col("_cc_sy") * col(s"_cc_a$k") -
        col("_cc_n") * col("_cc_sx") * col(s"_cc_b$k") +
        (col("_cc_n") - lit(k)) * col("_cc_sx") * col("_cc_sy")
      struct(lit(k).as("lag"),
        when(dx > 0 && dy > 0 && col("_cc_n") > k,
          floor(num.cast("double") * lit(1000000.0) /
            sqrt(dx.cast("double") * dy.cast("double"))).cast("long"))
          .as("ccf_micro"))
    }
    moments.select(g ++ Seq(col("_cc_n").cast("long").as("n"),
        explode(array(perLag: _*)).as("_cc_e")): _*)
      .select(g ++ Seq(col("_cc_e.lag").as("lag"), col("n"),
        col("_cc_e.ccf_micro").as("ccf_micro")): _*)
  }

  /** Rolling z-score of the daily mean value per key over a trailing
    * `windowDays`-row frame — the spike detector beside [[cusum]]'s
    * drift detector. The z clears its denominators to
    * `z = (n·x − S)·10⁶ / sqrt(n·(n·SS − S²))` over exact integer
    * window sums: one double division and one sqrt (both individually
    * correctly-rounded IEEE ops — the Spearman discipline), floored to
    * micro. NULL when the frame has zero variance. `is_spike` flags
    * |z| > 2.
    *
    * Scale: day aggregation shuffles once; all three window sums share
    * one (key, day) sort over the ≤|days| cell relation.
    */
  def rollingZ(events: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, windowDays: Int = 7): DataFrame = {
    require(keyCols.nonEmpty, "rollingZ needs key columns")
    require(windowDays > 1, "rollingZ needs a window of at least 2 days")
    val g = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("day"))
      .rowsBetween(-(windowDays - 1), 0)
    events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(g ++ Seq(to_date(col(tsCol)).as("day"),
        floor(col(valueCol) * 100).cast("long").as("_rz_c")): _*)
      .groupBy(g :+ col("day"): _*)
      .agg(count(lit(1)).as("_rz_n"), sum(col("_rz_c")).as("_rz_sum"))
      .withColumn("x_cents", expr("_rz_sum div _rz_n"))
      .withColumn("_rz_m", count(lit(1)).over(w))
      .withColumn("_rz_s", sum(col("x_cents")).over(w))
      .withColumn("_rz_ss", sum(col("x_cents") * col("x_cents")).over(w))
      .withColumn("z_micro", expr(
        """case when _rz_m * _rz_ss - _rz_s * _rz_s > 0 then
          |cast(floor((_rz_m * x_cents - _rz_s) * 1e6 /
          |  sqrt(cast(_rz_m * (_rz_m * _rz_ss - _rz_s * _rz_s) as double)))
          |  as bigint) end""".stripMargin))
      .select(g ++ Seq(col("day"), col("x_cents"), col("z_micro"),
        (col("z_micro").isNotNull &&
          abs(col("z_micro")) > 2000000L).as("is_spike")): _*)
  }

  /** Top-k 3-step event paths — the sequence-mining extension of
    * [[transitionMatrix]] (2-step): which (a → b → c) journeys dominate
    * the stream? The path-shape probe behind funnel design and
    * session-template discovery.
    *
    * Per user, events order by (ts, tie) — callers pass a tie-break id
    * so the sequence is a TOTAL order (the transitionMatrix rule) —
    * and two `lead`s emit each length-3 window. Counts are exact; the
    * top-k election is `row_number` over (count desc, path) — a total
    * order, deterministic.
    *
    * Output: `(step1, step2, step3, n, rank)`, rank ≤ k.
    *
    * Scale: one user-keyed shuffle for the sequence window, a hash
    * aggregation onto ≤|types|³ path cells, and the ranking window runs
    * over that cell relation — global but vocabulary-sized, never
    * event-sized.
    */
  def pathTrigrams(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "pathTrigrams needs positive k")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val seq = events.filter(col(userCol).isNotNull &&
        col(tsCol).isNotNull && col(typeCol).isNotNull)
      .withColumn("_p3_b", lead(col(typeCol), 1).over(w))
      .withColumn("_p3_c", lead(col(typeCol), 2).over(w))
      .filter(col("_p3_b").isNotNull && col("_p3_c").isNotNull)
    seq.groupBy(col(typeCol).as("step1"), col("_p3_b").as("step2"),
        col("_p3_c").as("step3"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(Window.orderBy(col("n").desc,
        col("step1"), col("step2"), col("step3"))).cast("long"))
      .filter(col("rank") <= k.toLong)
  }

  /** Additive seasonal-trend decomposition of a daily series — the
    * classic-decomposition form of STL (trend by centered moving
    * average, seasonal by day-of-week means of the detrended series,
    * residual as what's left) — the "is this spike seasonality or an
    * anomaly?" splitter that [[rollingZ]] and [[cusum]] assume has
    * already happened:
    *
    *   trend_t    = centered (2h+1)-row mean        (integral div)
    *   seasonal_d = mean of (x − trend) over dow d  (integral div)
    *   residual_t = x_t − trend_t − seasonal_{dow(t)}
    *
    * Exact cents arithmetic end-to-end — window sums and dow sums are
    * exact longs/decimals, each mean ONE truncating integral division
    * (both engines truncate toward zero on the negative detrended
    * values — the linearTrend pin). Edge rows average over the rows
    * actually in the window (count-divided, not padded). Feed a
    * GAP-FREE series ([[gapFill]] first if days can be missing — the
    * row window means "7 calendar days" only when days are dense).
    *
    * Output: `(key…, day, x_cents, trend_cents, seasonal_cents,
    * residual_cents)`.
    *
    * Scale: one hash aggregation onto (key, day) cells, one key-
    * partitioned window pass, one ≤7-row-per-key seasonal relation
    * broadcast back. Windows never see raw events.
    */
  def decompose(events: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, halfWindow: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "decompose needs key columns")
    require(halfWindow >= 1, "decompose needs halfWindow >= 1")
    val g = keyCols.map(col)
    val dec = "decimal(38,0)"
    val daily = events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(g :+ col(tsCol).cast("date").as("day"): _*)
      .agg(sum(floor(col(valueCol) * 100).cast("long")).as("x_cents"))
    val w = Window.partitionBy(g: _*).orderBy(col("day"))
      .rowsBetween(-halfWindow, halfWindow)
    val t = daily
      .withColumn("_dc_ws", sum(col("x_cents")).over(w))
      .withColumn("_dc_wn", count(lit(1)).over(w))
      .withColumn("trend_cents", expr("_dc_ws div _dc_wn"))
      .withColumn("_dc_det", col("x_cents") - col("trend_cents"))
      .withColumn("_dc_dow", dayofweek(col("day")))
    val seas = t.groupBy(g :+ col("_dc_dow"): _*)
      .agg(sum(col("_dc_det").cast(dec)).as("_dc_ss"),
        count(lit(1)).as("_dc_sn"))
      .select(g ++ Seq(col("_dc_dow"),
        expr(s"(_dc_ss div cast(_dc_sn as $dec))").cast("long")
          .as("seasonal_cents")): _*)
    t.join(broadcast(seas), keyCols :+ "_dc_dow")
      .select(g ++ Seq(col("day"), col("x_cents"), col("trend_cents"),
        col("seasonal_cents"),
        (col("x_cents") - col("trend_cents") - col("seasonal_cents"))
          .as("residual_cents")): _*)
  }

  /** RFM segmentation — the classic customer/entity value grid
    * (recency, frequency, monetary), each scored into quintiles with 5 =
    * best: how recently did the entity act, how often, and for how much.
    * The data-pipeline reading: which users/domains/sources deserve
    * recrawl or retention effort.
    *
    * Deterministic cross-engine: recency is whole days behind the
    * CORPUS max timestamp (a single-row broadcast — data-derived, so
    * re-runs and engines agree without a wall clock); monetary is exact
    * cents; every quintile is `ntile(5)` over a TOTAL order (metric,
    * then entity id — the liftDeciles tie rule, since ntile DOES depend
    * on order within ties). Orders are arranged worst-first so tile 5
    * is always the best (most recent / most frequent / biggest).
    *
    * Output: `(entity, r_days, freq, monetary_cents, r_score, f_score,
    * m_score)`.
    *
    * Scale: one full-data aggregation to per-entity triples (map-side
    * partials), then three window passes over the |entities| relation.
    * The three ntiles share one global sort partition — at 100 TB
    * entity counts, swap ntile for percent_rank-bucketing over a
    * range-partitioned sort, or score within a grouping key; this form
    * is the single-tenant report.
    */
  def rfmSegments(events: DataFrame, idCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ent = events
      .filter(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(idCol).as("entity"))
      .agg(max(col(tsCol)).as("_rfm_last"),
        count(lit(1)).as("freq"),
        sum(floor(col(valueCol) * 100).cast("long")).as("monetary_cents"))
    val mx = ent.agg(max(col("_rfm_last")).as("_rfm_max"))
    val w = (o: Seq[org.apache.spark.sql.Column]) =>
      ntile(5).over(Window.orderBy(o: _*)).cast("long")
    ent.crossJoin(broadcast(mx))
      .withColumn("r_days",
        datediff(col("_rfm_max").cast("date"), col("_rfm_last").cast("date"))
          .cast("long"))
      .withColumn("r_score",
        w(Seq(col("r_days").desc, col("entity")))) // most stale → tile 1
      .withColumn("f_score", w(Seq(col("freq").asc, col("entity"))))
      .withColumn("m_score", w(Seq(col("monetary_cents").asc, col("entity"))))
      .select(col("entity"), col("r_days"), col("freq"),
        col("monetary_cents"), col("r_score"), col("f_score"),
        col("m_score"))
  }
}
