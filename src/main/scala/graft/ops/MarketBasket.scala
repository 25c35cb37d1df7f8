package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Frequent item-pair mining over basket-shaped relations — the
  * association pass of a corpus/commerce pipeline (parts bought
  * together, tags co-occurring on documents, domains co-cited by a
  * page). The classic Apriori observation scoped to pairs: a pair's
  * support is computable by ONE self-join + aggregation, and pairs are
  * where association mining earns its keep at 100 TB (3-itemsets square
  * the candidate space for a sliver of additional signal).
  */
object MarketBasket {

  /** Co-occurrence support, confidence, and lift for item pairs within
    * baskets. Items are deduplicated per basket first (set semantics —
    * buying a part twice in one order is still one co-occurrence), then
    * pairs form by an `a < b` self-join keyed on the basket and
    * aggregate to support counts; pairs below `minSupport` drop before
    * the (broadcast-sized) item-frequency join.
    *
    * All-integer micro-unit statistics (Agresti's measures on exact
    * counts), so the result hash-oracles against any engine that
    * floor-divides the same way:
    *
    *   conf_micro(a→b) = (supp·10⁶)   div supp(a)
    *   lift_micro      = (supp·N·10⁶) div (supp(a)·supp(b))
    *
    * where N is the basket count — lift > 10⁶ means the pair co-occurs
    * more than independence predicts.
    *
    * Scale: the self-join is keyed on the basket id, so its cost is
    * Σ basket_size² — bounded in any real order/document corpus (a
    * 100-item basket yields 4,950 pairs; a power-law outlier basket is
    * a data-quality problem the pipeline's profiling pass flags, not a
    * plan hazard). Item frequencies are a |distinct items|-row relation
    * that broadcasts; the basket count travels as a one-row frame
    * (house crossJoin rule), never a driver scalar.
    */
  /** Just the `(a, b, supp)` pair-support relation — the co-occurrence
    * GRAPH builder (edges = pairs at or above `minSupport`, the
    * classic market-basket projection fed to [[graft.graph.GraphOps]]
    * triangle/community passes). Same set-semantics self-join as
    * [[itemPairs]] without the statistics joins.
    */
  def pairSupports(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L): DataFrame = {
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    items.select(col("basket"), col("item").as("a"))
      .join(items.select(col("basket"), col("item").as("b")), "basket")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= minSupport)
  }

  /** Item-based collaborative-filtering recommendations (Sarwar '01 —
    * the workhorse "customers who bought X also bought" ranker): item↔
    * item cosine similarity from co-occurrence counts, each user's
    * candidate scores summed over their owned items' neighbor lists,
    * owned items excluded, top-`k` per user.
    *
    * Similarity is the integer micro cosine
    * `w = ⌊supp·10⁶ / √(cnt_a·cnt_b)⌋` (one multiply/sqrt/divide/floor
    * per pair — the Spearman discipline), and scores are EXACT sums of
    * those micro weights, so rankings and scores both hash-oracle.
    * Ranking ties break on item id ascending — deterministic top-k.
    *
    * Scale levers, in the order they matter at 100 TB:
    * `basketCap` bounds the quadratic pair self-join per basket —
    * co-occurrence pairs are generated from at most `basketCap` items
    * per basket (the RAREST items by global frequency, item-id
    * tie-break: rare co-occurrences carry the similarity signal, while
    * a 100k-item power-law basket is 10¹⁰ pairs in ONE reducer task
    * without the cap — the standard production mitigation, a documented
    * approximation that is EXACT whenever every basket holds ≤ cap
    * items). Pair cost is therefore Σ min(basket_size, cap)², not
    * Σ basket_size². `minSupport` prunes the pair tail (rare pairs are
    * noise AND volume); `neighborCap` keeps each item's top-capped
    * neighbor list (row_number over the item partition — bounds the
    * per-user candidate explode by |owned|·cap regardless of item
    * popularity); the final top-k is a user-partitioned window over the
    * scored relation. Scoring and owned-item exclusion use the FULL
    * (uncapped) ownership relation — those joins are linear per owned
    * item, so only the quadratic stage needs the cap. Baskets dedup
    * first (set semantics).
    */
  /** `basketFilter` restricts WHICH baskets get recommendations — pushed
    * into the per-user scoring stage (the candidate explode, anti-join
    * and top-k window run only for matching baskets) while the item-item
    * similarity matrix keeps the FULL ownership relation, so the scores
    * a surviving basket sees are identical to the unfiltered run.
    * Serving a user segment (or one user) without this pushes the whole
    * corpus through scoring and throws most of it away — the dominant
    * cost of the query at every scale.
    */
  def recommendItems(df: DataFrame, basketCol: String, itemCol: String,
      k: Int = 3, minSupport: Long = 2L, neighborCap: Int = 50,
      basketCap: Int = 1000,
      basketFilter: Option[Column] = None): DataFrame = {
    require(k >= 1 && neighborCap >= 1 && basketCap >= 2,
      "recommendItems needs k, neighborCap >= 1 and basketCap >= 2")
    // the ownership relation feeds five plans (counts, both self-join
    // sides, scoring, exclusion) — persist or pay the source join 5×
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val itemCnt = items.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    // hot-basket mitigation: only the RAREST `basketCap` items per
    // basket enter the quadratic self-join (rare co-occurrences carry
    // the cosine signal; a power-law outlier basket otherwise lands
    // size² pairs in one task). Frequencies come from the FULL
    // ownership relation, so capping never distorts cnt_a/cnt_b.
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("basket")).orderBy(col("cnt").asc, col("item").asc)
    // persisted: the capped relation feeds BOTH sides of the pair
    // self-join — without a materialization point each side re-runs
    // the itemCnt join + basket window (measured 11.6 s → ~6 s at
    // sf0.1 when introducing the cap re-used one pass)
    //
    // cnt rides THROUGH the self-join (r19, verdict item #3): capped
    // already joined itemCnt for the rarity window, so keeping the
    // column lets the pair aggregation carry cnt_a/cnt_b as max() of a
    // per-item-constant — deleting the two post-aggregation itemCnt
    // joins (2 broadcast builds + their re-aggregations of the items
    // cache) from the query's dominant stage. Cost: one extra long per
    // side of the basket-keyed shuffle (guide §2.3 narrow-types trade,
    // won by removing two joins); map-side partial aggregation means
    // the (a,b)-keyed shuffle carries group rows, not pair rows.
    val capped = items.join(itemCnt, "item")
      .withColumn("_rc_bn", row_number().over(wb))
      .filter(col("_rc_bn") <= basketCap)
      .select(col("basket"), col("item"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = capped
      .select(col("basket"), col("item").as("a"), col("cnt").as("cnt_a"))
      .join(capped.select(col("basket"), col("item").as("b"),
        col("cnt").as("cnt_b")), "basket")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      // cnt is functionally dependent on the item id, so max() is "the"
      // value — exact, not an approximation
      .agg(count(lit(1)).as("supp"),
        max(col("cnt_a")).as("cnt_a"), max(col("cnt_b")).as("cnt_b"))
      .filter(col("supp") >= minSupport)
      .select(col("a"), col("b"),
        floor(col("supp").cast("double") * lit(1000000.0) /
          sqrt(col("cnt_a").cast("double") * col("cnt_b").cast("double")))
          .cast("long").as("w_micro"))
    // Both directions via ONE explode: the unionAll form executed the
    // whole quadratic pairs subtree (self-join + groupBy + two cnt
    // joins) once per branch — the query's dominant stage paid twice
    // (measured r13; the supplyEdges lesson). Same rows, same oracle.
    val sym = pairs.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst"), col("w_micro").as("w_micro")),
        struct(col("b").as("src"), col("a").as("dst"), col("w_micro").as("w_micro"))))
        .as("_rc_e"))
      .select(col("_rc_e.src").as("src"), col("_rc_e.dst").as("dst"),
        col("_rc_e.w_micro").as("w_micro"))
    // scoring-side ownership: basketFilter applies HERE (and only here —
    // itemCnt/capped/pairs above must stay global or similarities drift)
    val served = basketFilter.fold(items)(items.filter)
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("w_micro").desc, col("dst"))
    // Serving-subset pushdown (r15): the rank is per-src, so restricting
    // the ranked relation to srcs the SERVED baskets own is EXACT (a
    // src's top-k never depends on other srcs' rows) while the window's
    // sort-shuffle shrinks by the subset's item-coverage ratio — the
    // similarity matrix itself stays global above. No filter → no
    // change: neighbors rank for every item. Interleaved fresh-JVM A/B
    // at sf0.1 (60/15000 baskets ≈ 12% item coverage): wall-neutral
    // (6.35/8.52 s old vs 6.89/8.76 new mins, inside ambient drift) —
    // kept because it is the correct plan for the serving-subset shape,
    // where coverage is 0.1-1% and the global rank would dominate: the
    // window is this operator's only stage whose input does NOT shrink
    // with the served set otherwise.
    val symServed = basketFilter.fold(sym)(_ =>
      sym.join(served.select(col("item").as("src")).distinct(),
        Seq("src"), "left_semi"))
    val neighbors = symServed
      .withColumn("_rc_rn", row_number().over(wn))
      .filter(col("_rc_rn") <= neighborCap)
      .drop("_rc_rn")
    val scored = served.select(col("basket"), col("item").as("src"))
      .join(neighbors, "src")
      .groupBy(col("basket"), col("dst"))
      .agg(sum(col("w_micro")).as("score_micro"))
      .join(served.select(col("basket"), col("item").as("dst")),
        Seq("basket", "dst"), "left_anti")
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("basket"))
      .orderBy(col("score_micro").desc, col("dst"))
    scored
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select(col("basket"), col("rank"), col("dst").as("item"),
        col("score_micro"))
  }

  /** Deterministic negative sampling for contrastive training — per
    * basket/user, `k` items they did NOT interact with, drawn by seeded
    * content hash so every engine and every re-run produces the same
    * dataset (the applyMixture/weightedSample reproducibility rule;
    * "random" negatives that change per run poison eval comparisons).
    *
    * Draw `j = 1..k+overdraw` candidate indexes per basket as
    * `md5(seed:basket:j)` into a DENSE item index (row_number over the
    * distinct item relation), drop owned items and hash collisions
    * (min-j keeps the first draw of a repeated item), then keep the
    * first `k` by draw order. A user owning most of the catalog can
    * come up short — the honest outcome, visible as < k rows, tuned by
    * `overdraw`. Hard negatives (high-scoring non-owned items) are the
    * TOP of [[recommendItems]] — this op is the uniform tail that
    * contrastive batches mix with them.
    *
    * Output: `(basket, rank, item)`, rank 1..≤k in draw order.
    *
    * Scale: |baskets|·(k+overdraw) draw rows — linear, never the
    * baskets×items cross product; the index join and ownership
    * anti-join are keyed; the final rank windows partition by basket.
    * Item catalog must fit 8 hex digits (~4·10⁹) of draw space.
    */
  def negativeSamples(df: DataFrame, basketCol: String, itemCol: String,
      k: Int = 3, seed: String = "neg", overdraw: Int = 8): DataFrame = {
    require(k >= 1 && overdraw >= 0, "negativeSamples needs k >= 1")
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val itemIdx = items.select(col("item")).distinct()
      .withColumn("_ns_idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("item")))
        .cast("long") - 1L)
    val m = itemIdx.agg(count(lit(1)).as("_ns_m"))
    val draws = items.select(col("basket")).distinct()
      .crossJoin(broadcast(m))
      .select(col("basket"), col("_ns_m"),
        explode(sequence(lit(1), lit(k + overdraw))).as("_ns_j"))
      .withColumn("_ns_idx",
        pmod(conv(substring(md5(concat(lit(seed + ":"),
          col("basket").cast("string"), lit(":"),
          col("_ns_j").cast("string"))), 1, 8), 16, 10).cast("long"),
          col("_ns_m")))
    draws
      .join(itemIdx, Seq("_ns_idx"))
      .join(items, Seq("basket", "item"), "left_anti")
      .groupBy(col("basket"), col("item"))
      .agg(min(col("_ns_j")).as("_ns_j"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("basket")).orderBy(col("_ns_j"))))
      .filter(col("rank") <= k)
      .select(col("basket"), col("rank"), col("item"))
  }

  def itemPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L): DataFrame = {
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = items.select(col("basket"), col("item").as("a"))
      .join(items.select(col("basket"), col("item").as("b")), "basket")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= minSupport)
    val itemCnt = items.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val nBaskets = items.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(itemCnt.select(col("item").as("a"), col("cnt").as("cnt_a")), "a")
      .join(itemCnt.select(col("item").as("b"), col("cnt").as("cnt_b")), "b")
      .crossJoin(broadcast(nBaskets))
      .select(col("a"), col("b"), col("supp"),
        expr("(supp * 1000000) div cnt_a").as("conf_a_b_micro"),
        expr("(supp * 1000000) div cnt_b").as("conf_b_a_micro"),
        expr("(supp * n_baskets * 1000000) div (cnt_a * cnt_b)")
          .as("lift_micro"))
  }
}
