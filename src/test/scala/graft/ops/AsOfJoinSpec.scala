package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of: latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3"))   // key 2: no right rows before
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0),
      (1L, ts("2024-01-01 13:00:00"), 30.0),   // after both left rows
      (2L, ts("2024-01-01 09:30:00"), 99.0))   // after key-2's left row
      .toDF("rk", "rt", "rv")

    val out = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("rv"))
      .orderBy("tag").collect()
    assert(out(0).getAs[Double]("rv") == 10.0)   // l1 ← 09:30
    assert(out(1).getAs[Double]("rv") == 20.0)   // l2 ← 11:00
    assert(out(2).isNullAt(out(2).fieldIndex("rv")))  // l3 ← nothing
  }

  test("equal timestamps match inclusively (right at t == left t)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 7.0)).toDF("rk", "rt", "rv")
    val out = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("rv")).collect()
    assert(out(0).getAs[Double]("rv") == 7.0)
  }

  test("null value fields come atomically from the latest right row") {
    // The latest matching right row carries (null, "b2") — BOTH values must
    // come from it; per-column last(ignoreNulls) would resurrect a1 from
    // the older row and stitch a frankenstein (a1, b2) row.
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option("a1"), Option("b1")),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[String], Option("b2")))
      .toDF("rk", "rt", "va", "vb")
    val out = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("va", "vb"))
      .collect()(0)
    assert(out.isNullAt(out.fieldIndex("va")))
    assert(out.getAs[String]("vb") == "b2")
  }

  test("duplicate right timestamps break ties deterministically (max struct)") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 5.0),
      (1L, ts("2024-01-01 11:00:00"), 9.0),
      (1L, ts("2024-01-01 11:00:00"), 1.0))
      .toDF("rk", "rt", "rv")
    // Repartition shuffles arrival order; the winner must stay stable.
    (1 to 3).foreach { n =>
      val out = AsOfJoin.backward(
        left, right.repartition(n), "k", "rk", "t", "rt", Seq("rv")).collect()(0)
      assert(out.getAs[Double]("rv") == 9.0)
    }
  }

  test("non-orderable value columns (MapType) pass analysis and arrive intact") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Map("a" -> 1)),
      (1L, ts("2024-01-01 11:00:00"), Map("b" -> 2)))
      .toDF("rk", "rt", "props")
    val out = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("props"))
      .collect()(0)
    assert(out.getAs[Map[String, Int]]("props") == Map("b" -> 2))
  }

  test("map-only ties still break deterministically (content-hash tiebreak)") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), Map("x" -> 1)),
      (1L, ts("2024-01-01 11:00:00"), Map("y" -> 2)))
      .toDF("rk", "rt", "props")
    val winners = (1 to 3).map { n =>
      AsOfJoin.backward(left, right.repartition(n), "k", "rk", "t", "rt", Seq("props"))
        .collect()(0).getAs[Map[String, Int]]("props")
    }
    assert(winners.distinct.size == 1)
  }

  test("mixed orderable + map values: tiebreak uses the orderable columns") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 5.0, Map("lo" -> 1)),
      (1L, ts("2024-01-01 11:00:00"), 9.0, Map("hi" -> 2)))
      .toDF("rk", "rt", "rv", "props")
    (1 to 3).foreach { n =>
      val out = AsOfJoin.backward(
        left, right.repartition(n), "k", "rk", "t", "rt", Seq("rv", "props")).collect()(0)
      assert(out.getAs[Double]("rv") == 9.0)
      assert(out.getAs[Map[String, Int]]("props") == Map("hi" -> 2))
    }
  }

  test("forward as-of: earliest right row at-or-after each left row, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:30:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3"))   // key 2: no right rows after
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),   // before both left rows
      (1L, ts("2024-01-01 11:00:00"), 20.0),
      (1L, ts("2024-01-01 13:00:00"), 30.0),
      (2L, ts("2024-01-01 08:30:00"), 99.0))   // before key-2's left row
      .toDF("rk", "rt", "rv")
    val out = AsOfJoin.forward(left, right, "k", "rk", "t", "rt", Seq("rv"))
      .orderBy("tag").collect()
    assert(out(0).getAs[Double]("rv") == 20.0)   // l1 → 11:00
    assert(out(1).getAs[Double]("rv") == 30.0)   // l2 → 13:00
    assert(out(2).isNullAt(out(2).fieldIndex("rv")))  // l3 → nothing after
  }

  test("forward as-of matches inclusively and breaks ties on smallest value") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7.0),
      (1L, ts("2024-01-01 10:00:00"), 3.0))
      .toDF("rk", "rt", "rv")
    (1 to 3).foreach { n =>
      val out = AsOfJoin.forward(
        left, right.repartition(n), "k", "rk", "t", "rt", Seq("rv")).collect()(0)
      assert(out.getAs[Double]("rv") == 3.0) // inclusive ≥, smallest _tb wins
    }
  }

  test("plan shuffles once by key — no range/cross join") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("rk", "rt", "rv")
    val plan = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"as-of join must not plan a cross join:\n$plan")
  }
}
