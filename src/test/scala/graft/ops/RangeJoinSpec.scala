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
}
