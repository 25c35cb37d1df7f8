package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the naive inequality join, without cross-join plan") {
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 15.5), (4L, 99.0)).toDF("pid", "p")
    val intervals = Seq(
      (10L, 4.0, 6.0),     // catches 5.0
      (20L, 9.0, 16.0),    // catches 10.0 and 15.5 (spans multiple bins)
      (30L, 15.5, 15.5),   // degenerate interval, inclusive bounds
      (40L, 50.0, 60.0))   // catches nothing
      .toDF("iid", "lo", "hi")

    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", binWidth = 2.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 20L), (3L, 20L), (3L, 30L)))

    val plan = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", binWidth = 2.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"range join must stay an equi-join on the bin key:\n$plan")
  }

  test("no duplicate matches when an interval spans many bins") {
    val points = Seq((1L, 50.0)).toDF("pid", "p")
    val intervals = Seq((10L, 0.0, 100.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", binWidth = 1.0)
    assert(out.count() == 1)
  }

  test("intervalOverlap equals the naive join at several bin widths, exactly once") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 120).map { i =>
      val lo = rnd.nextInt(200).toDouble
      (i.toLong, (i % 3).toLong, lo, lo + rnd.nextInt(30))
    }
    val a = rows.toDF("a_id", "a_k", "a_lo", "a_hi")
    val b = rows.toDF("b_id", "b_k", "b_lo", "b_hi")
    val naive = a.join(b,
        col("a_k") === col("b_k") &&
          col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    for (bw <- Seq(1.0, 7.0, 64.0, 1000.0)) {
      val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
          bw, Seq("a_k"), Seq("b_k"))
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      // sorted SEQ comparison: duplicates would fail, not just misses
      assert(got == naive, s"binWidth=$bw")
    }
  }

  test("intervalOverlap: closed semantics — touching endpoints overlap") {
    val a = Seq((1L, 0.0, 10.0)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((2L, 10.0, 20.0), (3L, 10.5, 20.0)).toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 4.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("intervalOverlap: keys isolate pairs; plan stays an equi-join") {
    val a = Seq((1L, 1L, 0.0, 5.0), (2L, 2L, 0.0, 5.0)).toDF("a_id", "a_k", "a_lo", "a_hi")
    val b = Seq((3L, 1L, 3.0, 8.0)).toDF("b_id", "b_k", "b_lo", "b_hi")
    val j = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
      2.0, Seq("a_k"), Seq("b_k"))
    assert(j.select("a_id", "b_id").as[(Long, Long)].collect().toSet ==
      Set((1L, 3L)))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"interval overlap must stay an equi-join on the bin key:\n$plan")
  }
}
