package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  private val baskets = Seq(
    // (basket, item): {1,2,3}, {1,2}, {1,2}, {3}, plus a dup row in b1
    (1L, 10L), (1L, 20L), (1L, 30L), (1L, 10L),
    (2L, 10L), (2L, 20L),
    (3L, 10L), (3L, 20L),
    (4L, 30L)).toDF("basket", "item")

  test("itemPairs: exact support, confidence, and lift on a hand computation") {
    val out = MarketBasket.itemPairs(baskets, "basket", "item")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // supp(10,20)=3, cnt(10)=3, cnt(20)=3, N=4:
    //   conf both ways = 10⁶, lift = 3·4·10⁶/9 = 1333333 (floored)
    assert(out((10L, 20L)) == ((3L, 1000000L, 1000000L, 1333333L)))
    // supp(10,30)=1 (set semantics — the dup (1,10) row counts once),
    // cnt(30)=2: conf 10→30 = 333333, conf 30→10 = 500000,
    // lift = 1·4·10⁶/6 = 666666
    assert(out((10L, 30L)) == ((1L, 333333L, 500000L, 666666L)))
    assert(out((20L, 30L)) == ((1L, 333333L, 500000L, 666666L)))
  }

  test("itemPairs: minSupport prunes before the stats joins") {
    val out = MarketBasket.itemPairs(baskets, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 20L)))
  }

  test("pairSupports matches itemPairs' (a, b, supp) projection") {
    val a = MarketBasket.pairSupports(baskets, "basket", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = MarketBasket.itemPairs(baskets, "basket", "item")
      .select(col("a"), col("b"), col("supp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("itemPairs: null baskets/items drop; single-item baskets yield no pairs") {
    val df = Seq(
      (Some(1L), Some(10L)), (Some(1L), None), (None, Some(20L)),
      (Some(2L), Some(30L))).toDF("basket", "item")
    assert(MarketBasket.itemPairs(df, "basket", "item").count() == 0)
  }
}
