package graft.ops

import org.apache.spark.sql.DataFrame
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
