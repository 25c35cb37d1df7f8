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

  test("recommendItems: hand-computed cosine scores, owned excluded") {
    // u1:{A,B} u2:{A,B,C} u3:{B,C} u4:{A,C}
    // cnt: A=3 B=3 C=3; supp: AB=2 AC=2 BC=2
    // w = floor(2e6/3) = 666666 for every edge
    // u1 candidates: C via A and via B -> 2*666666; A,B owned-excluded
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (2L, "C"),
      (3L, "B"), (3L, "C"), (4L, "A"), (4L, "C")).toDF("u", "i")
    val out = MarketBasket.recommendItems(df, "u", "i", k = 3,
        minSupport = 2L, neighborCap = 10)
      .orderBy("basket", "rank").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.length == 1)
    assert(u1.head.getString(2) == "C" && u1.head.getLong(3) == 2L * 666666L)
    // u2 owns everything -> no recommendations at all
    assert(!out.exists(_.getLong(0) == 2L))
  }

  test("recommendItems: asymmetric item frequencies survive the carried-cnt " +
      "pair aggregation (r19 internals)") {
    // r19 carries cnt_a/cnt_b THROUGH the pair self-join (max() of a
    // per-item constant) instead of re-joining itemCnt after the
    // aggregation. Skewed frequencies + a duplicate purchase row pin
    // that the carried values are the true per-item counts, per side:
    // cnt: A=4 B=3 C=2; supp: AB=2 AC=1 BC=1
    // w(AB)=floor(2e6/sqrt(12))=577350, w(AC)=floor(1e6/sqrt(8))=353553,
    // w(BC)=floor(1e6/sqrt(6))=408248
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"),
      (3L, "A"), // duplicate row: set semantics, must not inflate cnt
      (4L, "A"), (4L, "C"), (5L, "B"), (5L, "C")).toDF("u", "i")
    val out = MarketBasket.recommendItems(df, "u", "i", k = 3,
        minSupport = 1L, neighborCap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3))).toSet
    // u3 owns {A}: B via AB, C via AC
    assert(out.contains((3L, 1, "B", 577350L)))
    assert(out.contains((3L, 2, "C", 353553L)))
    // u1 owns {A,B}: C scores w(AC)+w(BC)
    assert(out.contains((1L, 1, "C", 353553L + 408248L)))
  }

  test("negativeSamples: never owned, deterministic, ranked in draw order") {
    val df = Seq((1L, "A"), (1L, "B"), (2L, "C"), (2L, "D"), (3L, "E"))
      .toDF("u", "i")
    val out1 = MarketBasket.negativeSamples(df, "u", "i", k = 2)
      .orderBy("basket", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val out2 = MarketBasket.negativeSamples(df, "u", "i", k = 2)
      .orderBy("basket", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(out1 == out2, "sampling must be reproducible")
    val owned = Map(1L -> Set("A", "B"), 2L -> Set("C", "D"), 3L -> Set("E"))
    assert(out1.forall { case (b, _, it) => !owned(b).contains(it) })
    assert(out1.groupBy(_._1).values.forall(g =>
      g.map(_._2).sorted == (1 to g.size).toSeq && g.size <= 2))
  }

  test("negativeSamples: a user owning nearly everything comes up short honestly") {
    // catalog = {A, B}; u1 owns both -> NO negatives exist for u1
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A")).toDF("u", "i")
    val out = MarketBasket.negativeSamples(df, "u", "i", k = 3, overdraw = 20)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(!out.exists(_._1 == 1L))
    assert(out.filter(_._1 == 2L).map(_._2).toSet == Set("B"))
  }

  test("recommendItems: neighborCap truncates weakest edges; ties break on item id") {
    // hub H co-occurs with A,B,C (supp 2 each, equal weights); cap=2
    // keeps neighbors A,B (id order) — C unreachable from H alone.
    val baskets = Seq(
      (1L, "H"), (1L, "A"), (2L, "H"), (2L, "A"),
      (3L, "H"), (3L, "B"), (4L, "H"), (4L, "B"),
      (5L, "H"), (5L, "C"), (6L, "H"), (6L, "C"))
    val df = baskets.toDF("u", "i")
    val capped = MarketBasket.recommendItems(df, "u", "i", k = 5,
      minSupport = 2L, neighborCap = 2)
    // basket 5/6 own {H, C}: candidates from H's capped list = {A, B}
    val b5 = capped.filter(col("basket") === 5L)
      .orderBy("rank").collect().map(_.getString(2)).toSeq
    assert(b5 == Seq("A", "B"))
    val full = MarketBasket.recommendItems(df, "u", "i", k = 5,
      minSupport = 2L, neighborCap = 10)
    // uncapped, C's co-owners see all three hub neighbors minus owned
    val b5f = full.filter(col("basket") === 5L)
      .orderBy("rank").collect().map(_.getString(2)).toSeq
    assert(b5f == Seq("A", "B"))
    // and basket 1 (owns H,A) sees B,C in id order (equal scores)
    val b1f = full.filter(col("basket") === 1L)
      .orderBy("rank").collect().map(_.getString(2)).toSeq
    assert(b1f == Seq("B", "C"))
  }

  test("recommendItems: basketCap is exact when every basket fits under it") {
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (2L, "C"),
      (3L, "B"), (3L, "C"), (4L, "A"), (4L, "C")).toDF("u", "i")
    def rows(cap: Int) = MarketBasket.recommendItems(df, "u", "i", k = 5,
        minSupport = 2L, neighborCap = 10, basketCap = cap)
      .orderBy("basket", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq
    // largest basket holds 3 items: any cap >= 3 must be EXACTLY the
    // uncapped result (the documented approximation contract)
    assert(rows(3) == rows(1000) && rows(3).nonEmpty)
  }

  test("recommendItems: basketCap keeps the rarest items of a hot basket") {
    // basket 1 is hot: {A, B, C, D}. Global counts: A=3, B=2, C=2, D=1
    // (rarity order D < B=C < A, id tie-break B before C). cap=2 keeps
    // {D, B} in basket 1 — so pair (A, x) support comes only from the
    // small baskets, and D still pairs with B.
    val df = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"), (1L, "D"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C")).toDF("u", "i")
    val pairsSeen = MarketBasket.recommendItems(df, "u", "i", k = 5,
        minSupport = 1L, neighborCap = 10, basketCap = 2)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    // basket 2 owns {A, B}: with cap=2, surviving pairs are
    // (A,B) supp1 [basket2], (A,C) supp1 [basket3], (B,D) supp1
    // [basket1 capped to {D,B}] -> candidates for basket 2: C via A,
    // D via B. Uncapped it would also see C via B (basket 1's B-C pair).
    assert(pairsSeen.contains((2L, "C")) && pairsSeen.contains((2L, "D")))
    // basket 3 owns {A, C}: candidates B via A only (C-D pair was
    // capped away along with every basket-1 pair involving A or C)
    assert(pairsSeen.filter(_._1 == 3L) == Set((3L, "B")))
  }
}
