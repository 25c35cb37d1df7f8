package graft.ops

import graft.SparkSpec

class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  test("two items: the MM fixed point lands exactly on the win ratio") {
    // A beats B 3 of 4: for two items the update is π'_A = W_A(π_A+π_B)/n,
    // so one normalized pass already sits at π_A:π_B = 3:1 — and the
    // integer arithmetic is exact here (no floor loss): 1.5e6 / 0.5e6
    val m = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("w", "l")
    val out = BradleyTerry.ratings(m, "w", "l")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getLong(out("A").fieldIndex("rating_micro")) == 1500000L)
    assert(out("B").getLong(out("B").fieldIndex("rating_micro")) == 500000L)
    assert(out("A").getLong(out("A").fieldIndex("wins")) == 3L)
    assert(out("A").getLong(out("A").fieldIndex("n_matches")) == 4L)
  }

  test("transitive dominance orders the ratings; zero-win item pins to 0") {
    // A beats B twice, B beats C twice, A beats C twice → A > B > C; C
    // never wins → exactly 0 (W_C = 0 survives every division)
    val m = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
      ("A", "C"), ("A", "C")).toDF("w", "l")
    val out = BradleyTerry.ratings(m, "w", "l")
      .collect().map(r => r.getString(0) ->
        r.getLong(r.fieldIndex("rating_micro"))).toMap
    assert(out("A") > out("B") && out("B") > out("C"))
    assert(out("C") == 0L)
  }

  test("a balanced round-robin rates everyone at the 10⁶ mean") {
    // every ordered pair split 1–1: perfectly symmetric → π_i = mean
    val items = Seq("A", "B", "C")
    val m = (for {
      a <- items; b <- items if a < b
      mm <- Seq((a, b), (b, a))
    } yield mm).toDF("w", "l")
    val out = BradleyTerry.ratings(m, "w", "l").collect()
    assert(out.forall(_.getLong(3) == 1000000L),
      out.map(r => r.getString(0) -> r.getLong(3)).toSeq.toString)
  }

  test("null-sided matches drop; empty input yields an empty frame") {
    val m = Seq((Some("A"), Some("B")), (None, Some("B")),
      (Some("A"), None)).toDF("w", "l")
    val out = BradleyTerry.ratings(m, "w", "l").collect()
    assert(out.length == 2) // A and B, from the single valid match
    val empty = BradleyTerry.ratings(
      Seq.empty[(String, String)].toDF("w", "l"), "w", "l").collect()
    assert(empty.isEmpty)
  }
}
