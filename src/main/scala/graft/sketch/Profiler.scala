package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the "what is in this table" pass every
  * pipeline runs before setting filters and budgets, shaped for scale:
  * the frame is stacked to `(column, value)` STRING pairs once, then the
  * whole profile is two hash aggregations over the stack (simple stats,
  * and the deterministic HLL register relation for distinct estimates).
  * No per-column jobs, no exact count-distinct (whose state is the
  * column's full value set — the thing that does not fit at 100 TB).
  */
object Profiler {

  /** Profile `cols` of `df`: one row per column —
    * `(column, n_rows, n_nulls, n_distinct_est, min_val, max_val)`.
    *
    * Values are profiled AS STRINGS (cast once in the stack): min/max are
    * lexicographic and the distinct estimate is over the string form —
    * the uniform treatment that lets one operator profile any schema and
    * both engines agree byte-for-byte. The distinct estimate is the
    * deterministic [[Sketches.hllEstimate]] (±~1.6%), so the whole
    * profile hash-oracles; NULLs count toward `n_nulls`, never toward
    * distinct.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val stackArgs: Seq[Column] = cols.flatMap(c =>
      Seq(lit(c), col(c).cast("string")))
    val stacked = df.select(
      stack(lit(cols.size) +: stackArgs: _*).as(Seq("column", "value")))
    val stats = stacked.groupBy(col("column")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls"),
      min(col("value")).as("min_val"),
      max(col("value")).as("max_val"))
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(stacked, Seq("column"), "value"), Seq("column"))
    stats.join(est, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        coalesce(col("hll_estimate"), lit(0L)).as("n_distinct_est"),
        col("min_val"), col("max_val"))
  }

  /** Schema-stats drift between two snapshots of the same table — the
    * "did this week's crawl change shape?" gate that catches what
    * content diffs miss (a column silently going null-heavy, a
    * cardinality explosion, a new min/max): [[profileColumns]] runs on
    * both sides and the per-column stats are joined into one row per
    * column — `(column, n_rows_before, n_rows_after,
    * null_ratio_before_micro, null_ratio_after_micro,
    * distinct_ratio_micro, min_changed, max_changed)`.
    * `distinct_ratio_micro` is after/before of the deterministic HLL
    * estimates in micro units (1e6 = unchanged; the before estimate is
    * floored at 1 so an empty column never divides by zero);
    * min/max_changed are null-safe inequality flags.
    *
    * Everything is exact integer arithmetic over [[profileColumns]]'
    * deterministic outputs, so the diff hash-oracles like q_profile.
    *
    * Scale: two profile passes (each one stack + two hash aggs) joined
    * on the |cols|-row result — the diff itself costs nothing.
    */
  def profileDiff(before: DataFrame, after: DataFrame,
      cols: Seq[String]): DataFrame = {
    val b = profileColumns(before, cols)
    val a = profileColumns(after, cols)
    b.select(col("column"), col("n_rows").as("n_rows_before"),
        col("n_nulls").as("_pd_nb"),
        col("n_distinct_est").as("_pd_db"),
        col("min_val").as("_pd_minb"), col("max_val").as("_pd_maxb"))
      .join(a.select(col("column"), col("n_rows").as("n_rows_after"),
        col("n_nulls").as("_pd_na"),
        col("n_distinct_est").as("_pd_da"),
        col("min_val").as("_pd_mina"), col("max_val").as("_pd_maxa")),
        Seq("column"))
      .select(col("column"), col("n_rows_before"), col("n_rows_after"),
        when(col("n_rows_before") > 0L,
          expr("_pd_nb * 1000000 div n_rows_before")).otherwise(lit(0L))
          .as("null_ratio_before_micro"),
        when(col("n_rows_after") > 0L,
          expr("_pd_na * 1000000 div n_rows_after")).otherwise(lit(0L))
          .as("null_ratio_after_micro"),
        expr("_pd_da * 1000000 div greatest(_pd_db, 1)")
          .as("distinct_ratio_micro"),
        (!(col("_pd_minb") <=> col("_pd_mina"))).as("min_changed"),
        (!(col("_pd_maxb") <=> col("_pd_maxa"))).as("max_changed"))
  }

  /** k-anonymity / l-diversity audit (Sweeney '02 / Machanavajjhala
    * '07) — the privacy gate run before a table with quasi-identifiers
    * ships: rows grouped by the QI columns form equivalence classes;
    * the table is k-anonymous iff every class has ≥ k members, and
    * l-diverse iff every class carries ≥ l distinct sensitive values.
    * One summary row: `(n_rows, n_classes, k_anonymity,
    * n_violating_classes, rows_at_risk, risk_share_micro,
    * l_diversity)` — `k_anonymity` is the smallest class size (the
    * table's actual k), `rows_at_risk` counts members of classes
    * smaller than `k`, and `l_diversity` is the smallest per-class
    * distinct-sensitive count (absent sensitiveCol → NULL).
    *
    * Null QI values form their own class (a null zip code still
    * re-identifies); null sensitive values don't count toward
    * diversity (SQL count-distinct). Exact longs — hash-oracles.
    *
    * Scale: one hash aggregation onto QI classes (count-distinct via
    * the standard two-level expand when sensitiveCol is set) and one
    * single-row summary over the class relation — |classes| rows,
    * which is what k-anonymity bounds anyway.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: Option[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    require(k >= 1L, "kAnonymity needs k >= 1")
    val qi = qiCols.map(graft.Cols.q)
    val classes = sensitiveCol match {
      case Some(sc) => df.groupBy(qi: _*)
        .agg(count(lit(1)).as("_ka_n"),
          countDistinct(graft.Cols.q(sc)).as("_ka_l"))
      case None => df.groupBy(qi: _*)
        .agg(count(lit(1)).as("_ka_n"), lit(null).cast("long").as("_ka_l"))
    }
    classes.agg(
        sum(col("_ka_n")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("_ka_n")).as("k_anonymity"),
        sum(when(col("_ka_n") < k, 1L).otherwise(0L))
          .as("n_violating_classes"),
        sum(when(col("_ka_n") < k, col("_ka_n")).otherwise(0L))
          .as("rows_at_risk"),
        min(col("_ka_l")).as("l_diversity"))
      .select(col("n_rows"), col("n_classes"), col("k_anonymity"),
        col("n_violating_classes"), col("rows_at_risk"),
        when(col("n_rows") > 0L,
          expr("rows_at_risk * 1000000 div n_rows")).otherwise(lit(0L))
          .as("risk_share_micro"),
        col("l_diversity"))
  }

  /** Referential-integrity audit over declared foreign-key edges — the
    * join-health pass run before any pipeline trusts its star schema
    * ("how many lineitems point at orders that no longer exist?"). One
    * row per edge: `(relation, fk_col, n_rows, n_null_fk, n_orphans,
    * orphan_keys, orphan_micro, ok)` — `n_orphans` counts child rows
    * whose non-null FK has no parent, `orphan_keys` the distinct missing
    * key values, `orphan_micro` the orphan share of all child rows, and
    * the edge is `ok` iff both orphans and null FKs are zero (a null FK
    * is reported separately — it breaks inner joins silently rather
    * than loudly).
    *
    * Exact longs throughout — hash-oracles. Key values compare AS
    * STRINGS (the [[profileColumns]]/[[inclusionDeps]] convention —
    * exact for the integer/string keys a star schema declares, and what
    * lets every edge ride one stacked relation).
    *
    * Scale (r18 — was one independent totals+anti-join subtree PER edge,
    * which ran the 7-edge census as 54 AQE query-stage jobs and scanned
    * the child of a 3-FK table six times): ALL edges stack into one
    * `(edge_id, value)` relation — a table contributing k FK columns is
    * scanned ONCE reading k columns (explode of a k-literal array;
    * child/parent DataFrames are grouped by reference identity) — then
    * ONE hash aggregation folds it to `(edge, key, count)` with map-side
    * partials, bounded per edge by the parent's key cardinality plus the
    * orphan keys, never the child's row count. That per-key relation
    * persists (it feeds both the per-edge totals and the anti-join — a
    * cache barrier, so the stack is computed once, not once per
    * consumer) and one anti-join against the stacked distinct parent
    * keys settles every edge together. Adding edges adds array entries
    * and reducer keys, not passes.
    */
  def referentialIntegrity(
      edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty, "referentialIntegrity needs at least one edge")
    import scala.collection.mutable.ArrayBuffer
    val spark = edges.head._2.sparkSession
    // group identical DataFrames (reference identity — Dataset does not
    // override equals) so a shared scan is planned once for all its edges
    def stack(sides: Seq[(Int, DataFrame, String)]): DataFrame = {
      val groups = ArrayBuffer.empty[(DataFrame, ArrayBuffer[(Int, String)])]
      for ((i, df, c) <- sides)
        groups.find(_._1 eq df) match {
          case Some((_, buf)) => buf += ((i, c))
          case None => groups += ((df, ArrayBuffer((i, c))))
        }
      groups.map { case (df, cols) =>
        df.select(explode(array(cols.toSeq.map { case (i, c) =>
            struct(lit(i).as("e"), graft.Cols.q(c).cast("string").as("v"))
          }: _*)).as("_ri_s"))
          .select(col("_ri_s.e").as("_ri_e"), col("_ri_s.v").as("_ri_v"))
      }.reduce(_ unionAll _)
    }
    // child stack keeps nulls (they carry the n_null_fk / n_rows share);
    // one (edge, key) aggregation serves totals AND the anti-join probe
    val perKey = stack(edges.zipWithIndex.map { case ((_, c, fk, _, _), i) =>
        (i, c, fk) })
      .groupBy(col("_ri_e"), col("_ri_v"))
      .agg(count(lit(1)).as("_ri_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = perKey.groupBy(col("_ri_e")).agg(
      sum(col("_ri_n")).as("n_rows"),
      coalesce(sum(when(col("_ri_v").isNull, col("_ri_n"))), lit(0L))
        .as("n_null_fk"))
    val parents = stack(edges.zipWithIndex.map { case ((_, _, _, p, pk), i) =>
        (i, p, pk) })
      .filter(col("_ri_v").isNotNull)
      .distinct()
    val orphans = perKey.filter(col("_ri_v").isNotNull)
      .join(parents, Seq("_ri_e", "_ri_v"), "left_anti")
      .groupBy(col("_ri_e"))
      .agg(sum(col("_ri_n")).as("n_orphans"),
        count(lit(1)).as("orphan_keys"))
    // |edges|-row assembly: labels drive (an empty child has no stack
    // rows, so its edge must still report zeros), both sides broadcast
    val labels = spark.createDataFrame(
        edges.zipWithIndex.map { case ((label, _, fk, _, _), i) =>
          (i, label, fk) })
      .toDF("_ri_e", "relation", "fk_col")
    labels.join(totals, Seq("_ri_e"), "left")
      .join(orphans, Seq("_ri_e"), "left")
      .select(col("relation"), col("fk_col"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_null_fk"), lit(0L)).as("n_null_fk"),
        coalesce(col("n_orphans"), lit(0L)).as("n_orphans"),
        coalesce(col("orphan_keys"), lit(0L)).as("orphan_keys"),
        when(coalesce(col("n_rows"), lit(0L)) > 0L,
          expr("coalesce(n_orphans, 0L) * 1000000 div n_rows"))
          .otherwise(lit(0L)).as("orphan_micro"),
        (coalesce(col("n_orphans"), lit(0L)) === 0L &&
          coalesce(col("n_null_fk"), lit(0L)) === 0L).as("ok"))
  }

  /** Unary inclusion-dependency discovery (the SPIDER question: which
    * columns' value sets are contained in which others?) over declared
    * attributes — the profiling pass that proposes joinable FK→PK edges
    * a schema never declared. For every ordered attribute pair `(a, b)`,
    * one row `(col_a, col_b, n_a, n_missing, included)`: `n_a` is a's
    * distinct non-null value count, `n_missing` how many of those values
    * b lacks, and `a ⊆ b` holds iff none are missing.
    *
    * Values compare AS STRINGS (the [[profileColumns]] convention — one
    * operator profiles any schema, both engines agree byte-for-byte).
    *
    * Scale — the reason this is NOT |attrs|² anti-joins: all attributes
    * stack into one `(value, attr_id)` relation and ONE hash aggregation
    * (bit_or of `1 << attr_id`; idempotent, so no pre-dedup pass) folds
    * it to `(value, presence-bitmask)`. That per-value relation then
    * collapses to `(mask, n_values)` — at most 2^|attrs| rows, in
    * practice a handful — and every pairwise verdict is arithmetic over
    * that constant-size relation. The data is scanned once per source
    * table and shuffled once, keyed on value; adding attributes adds
    * bits, not passes.
    */
  def inclusionDeps(attrs: Seq[(String, DataFrame, String)]): DataFrame = {
    require(attrs.size >= 2, "inclusionDeps needs at least two attributes")
    require(attrs.size <= 62, "inclusionDeps packs attr ids into one long")
    // Group attributes by DataFrame reference identity (Dataset does not
    // override equals) so a table contributing k attributes is scanned
    // ONCE reading k columns — explode replaces k single-column scans of
    // the same file (the referentialIntegrity stack shape). Callers must
    // pass one DataFrame object per table for the grouping to fire.
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(DataFrame, scala.collection.mutable.ArrayBuffer[(Int, String)])]
    for (((_, df, c), i) <- attrs.zipWithIndex)
      groups.find(_._1 eq df) match {
        case Some((_, buf)) => buf += ((i, c))
        case None => groups +=
          ((df, scala.collection.mutable.ArrayBuffer((i, c))))
      }
    val stacked = groups.map { case (df, cols) =>
      df.select(explode(array(cols.toSeq.map { case (i, c) =>
          struct(lit(i).as("a"), graft.Cols.q(c).cast("string").as("v"))
        }: _*)).as("_id_s"))
        .select(col("_id_s.v").as("_id_v"), col("_id_s.a").as("_id_a"))
        .filter(col("_id_v").isNotNull)
    }.reduce(_ unionAll _)
    val masks = stacked
      .groupBy(col("_id_v"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), _id_a)")).as("_id_m"))
      .groupBy(col("_id_m")).agg(count(lit(1)).as("_id_n"))
    val labels = attrs.head._2.sparkSession.createDataFrame(
        attrs.zipWithIndex.map { case ((label, _, _), i) => (i, label) })
      .toDF("_id_i", "_id_l")
    val pairs = labels.select(col("_id_i").as("_id_ai"), col("_id_l").as("col_a"))
      .crossJoin(labels.select(col("_id_i").as("_id_bi"), col("_id_l").as("col_b")))
      .filter(col("_id_ai") =!= col("_id_bi"))
    pairs.join(masks,
        expr("shiftright(_id_m, _id_ai) & 1") === 1L, "left")
      .groupBy(col("col_a"), col("col_b"), col("_id_bi"))
      .agg(coalesce(sum(col("_id_n")), lit(0L)).as("n_a"),
        coalesce(sum(when(
          expr("shiftright(_id_m, _id_bi) & 1") === 0L,
          col("_id_n")).otherwise(0L)), lit(0L)).as("n_missing"))
      .select(col("col_a"), col("col_b"), col("n_a"), col("n_missing"),
        (col("n_missing") === 0L).as("included"))
  }

  /** Functional-dependency / candidate-key discovery over declared
    * `(determinant, dependent)` column pairs — the schema-inference pass
    * that decides which columns can key a join or dedup ("does custkey
    * determine nationkey? is orderkey a candidate key here?"). One row
    * per pair: `(det_col, dep_col, n_dets, n_violating, max_deps,
    * fd_holds)` — `n_violating` counts determinant values mapping to
    * more than one distinct dependent value; the FD `det → dep` holds
    * iff that is zero.
    *
    * Exact longs throughout (hash-oracles). Null determinants are
    * excluded (a null never keys anything); null dependents don't count
    * as a distinct value (SQL count-distinct semantics), so a
    * determinant whose dependents are all null reports 0 deps and never
    * violates.
    *
    * Scale: per pair, Spark plans the count-distinct as the standard
    * two-level expand — partial (det, dep) dedup then a det-keyed count —
    * both hash aggregations with map-side partials; no group's value set
    * is ever buffered. Pairs are independent aggregations unioned at the
    * end (one scan each; profile few pairs per pass, or stack shared-
    * determinant pairs, when scans dominate).
    */
  def fdCheck(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "fdCheck needs at least one column pair")
    pairs.map { case (det, dep) =>
      df.filter(graft.Cols.q(det).isNotNull)
        .groupBy(graft.Cols.q(det))
        .agg(countDistinct(graft.Cols.q(dep)).as("_fd_nd"))
        .agg(
          count(lit(1)).as("n_dets"),
          sum(when(col("_fd_nd") > 1L, 1L).otherwise(0L)).as("n_violating"),
          max(col("_fd_nd")).as("max_deps"))
        .select(lit(det).as("det_col"), lit(dep).as("dep_col"),
          col("n_dets"), col("n_violating"), col("max_deps"),
          (col("n_violating") === 0L).as("fd_holds"))
    }.reduce(_ unionAll _)
  }

  /** Candidate-key audit — for each proposed column set, is it a unique
    * key of the frame? The constraint-discovery pass that pairs with
    * [[fdCheck]] (FDs) and [[inclusionDeps]] (INDs) to complete the
    * classic profiling triad; run before choosing dedup keys, merge
    * keys, or bucketing columns.
    *
    * Per candidate: total rows, rows with a fully non-null key,
    * distinct key values among those, and the worst duplication factor.
    * `is_unique` = no two non-null rows share the key; `is_key` adds
    * the no-NULLs requirement (a primary-key candidate). Exact counts —
    * each candidate is ONE strictly-reducing hash aggregation (the
    * distinct state is the key's value set: run on the candidates you
    * actually propose, not every combination; at 100 TB widths screen
    * first with [[profileColumns]]' HLL estimates).
    *
    * Output: one row per candidate:
    * `(key_cols, n_rows, n_nonnull, n_distinct, max_dup, is_unique,
    * is_key)`.
    */
  def keyCandidates(df: DataFrame,
      candidates: Seq[Seq[String]]): DataFrame = {
    require(candidates.nonEmpty, "keyCandidates needs candidates")
    // ONE persisted row-count relation for all candidates (r18): the
    // total was re-counted once per candidate — k near-free count(*)
    // passes, but passes nonetheless (final plan: 2k source scans for k
    // candidates; k+1 is the floor, each candidate's grouping pass being
    // inherent). Released via clearCache, the session-wide contract.
    val total = df.agg(count(lit(1)).as("n_rows")).persist()
    candidates.map { cs =>
      require(cs.nonEmpty, "empty candidate column set")
      val nonnull = cs.map(col(_).isNotNull).reduce(_ && _)
      val groups = df.filter(nonnull)
        .groupBy(cs.map(col): _*).agg(count(lit(1)).as("_kc_n"))
        .agg(count(lit(1)).as("n_distinct"),
          coalesce(sum(col("_kc_n")), lit(0L)).as("n_nonnull"),
          coalesce(max(col("_kc_n")), lit(0L)).as("max_dup"))
      total.crossJoin(broadcast(groups))
        .select(lit(cs.mkString(",")).as("key_cols"), col("n_rows"),
          col("n_nonnull"), col("n_distinct"), col("max_dup"),
          (col("n_distinct") === col("n_nonnull")).as("is_unique"),
          (col("n_distinct") === col("n_nonnull") &&
            col("n_nonnull") === col("n_rows")).as("is_key"))
    }.reduce(_ unionAll _)
  }

  /** Grouped mutual information between two categorical columns — the
    * GRADED dependence profile that [[fdCheck]]'s boolean and
    * chi-square's any-difference test bracket: 0 = independent, and MI
    * normalized by the smaller marginal entropy (NMI) = 1 when one
    * column determines the other. The feature-selection / redundancy
    * screen ("does source tell you anything about lang?").
    *
    * Everything reduces to the charEntropy count identity on exact
    * micro-nat terms (`qln = round(ln·10⁶)`, exact long/decimal sums):
    *
    *   N·MI = Σ n_xy·qln(n_xy) − Σ n_x·qln(n_x) − Σ n_y·qln(n_y)
    *          + N·qln(N)
    *   N·H(X) = N·qln(N) − Σ n_x·qln(n_x)       (ditto H(Y))
    *   NMI    = N·MI·10⁶ div min(N·H(X), N·H(Y))
    *
    * — every reported value is one integral division of exact decimals
    * (truncation toward zero pins both engines; rounding can leave MI a
    * few micro-nats below 0 on exactly independent data — definitional,
    * like every micro quantum here). Degenerate groups (a constant
    * column → min entropy 0) report NULL nmi.
    *
    * Output: `(group…, n, mi_micro, h_x_micro, h_y_micro, nmi_micro)`.
    *
    * Scale: ONE full-data hash aggregation onto (group, x, y) cells
    * with map-side partials; margins and every term re-aggregate the
    * cell relation (|X|·|Y| rows per group), and the three term
    * relations join back on the group key alone — broadcast-scale.
    */
  def mutualInformation(df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "mutualInformation needs group columns")
    val g = groupCols.map(col)
    val dec = "decimal(38,0)"
    def qln(c: Column): Column =
      round(log(c.cast("double")) * 1e6).cast("long")
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(g ++ Seq(col(xCol).as("_mi_x"), col(yCol).as("_mi_y")): _*)
      .groupBy(g ++ Seq(col("_mi_x"), col("_mi_y")): _*)
      .agg(count(lit(1)).as("_mi_n"))
      .persist() // feeds the joint term and both margins
    val joint = cells.groupBy(g: _*)
      .agg(sum((col("_mi_n").cast(dec) * qln(col("_mi_n"))).cast(dec))
        .as("_mi_txy"),
        sum(col("_mi_n")).as("n"))
    val tx = cells.groupBy(g :+ col("_mi_x"): _*)
      .agg(sum(col("_mi_n")).as("_mi_nx"))
      .groupBy(g: _*)
      .agg(sum((col("_mi_nx").cast(dec) * qln(col("_mi_nx"))).cast(dec))
        .as("_mi_tx"))
    val ty = cells.groupBy(g :+ col("_mi_y"): _*)
      .agg(sum(col("_mi_n")).as("_mi_ny"))
      .groupBy(g: _*)
      .agg(sum((col("_mi_ny").cast(dec) * qln(col("_mi_ny"))).cast(dec))
        .as("_mi_ty"))
    val tn = col("n").cast(dec) * qln(col("n"))
    joint.join(broadcast(tx), groupCols).join(broadcast(ty), groupCols)
      .withColumn("_mi_tn", tn)
      .withColumn("_mi_nmi_num",
        col("_mi_txy") - col("_mi_tx") - col("_mi_ty") + col("_mi_tn"))
      .withColumn("_mi_hx_n", col("_mi_tn") - col("_mi_tx"))
      .withColumn("_mi_hy_n", col("_mi_tn") - col("_mi_ty"))
      .select(g ++ Seq(col("n"),
        expr(s"_mi_nmi_num div cast(n as $dec)").as("mi_micro"),
        expr(s"_mi_hx_n div cast(n as $dec)").as("h_x_micro"),
        expr(s"_mi_hy_n div cast(n as $dec)").as("h_y_micro"),
        when(least(col("_mi_hx_n"), col("_mi_hy_n")) > 0L,
          expr("(_mi_nmi_num * 1000000) div " +
            "least(_mi_hx_n, _mi_hy_n)").cast("long")).as("nmi_micro")): _*)
  }
}
