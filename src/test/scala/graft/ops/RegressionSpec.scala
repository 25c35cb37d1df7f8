package graft.ops

import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("linearTrend recovers an exact line: slope, intercept, mean") {
    // y = 2x + 3 over x = 1..10 → slope 2, intercept 3, mean y = 14
    val d = (1 to 10).map(x => ("g", x, 2.0 * x + 3.0)).toDF("g", "x", "y")
    val r = Regression.linearTrend(d, Seq("g"), "x", "y").collect().head
    assert(r.getLong(1) == 10L)
    assert(r.getLong(2) == 2000000L)
    assert(r.getLong(3) == 3000000L)
    assert(r.getLong(4) == 14000000L)
  }

  test("linearTrend truncates rational slopes toward zero, both signs") {
    // y = x/3 over x ∈ {0,3,6} → 1/3 → 333333; y = −x/3 → −333333 (NOT
    // −333334: div truncates toward zero like DuckDB's //)
    val d = (Seq(0, 3, 6).map(x => ("up", x, x / 3.0)) ++
      Seq(0, 3, 6).map(x => ("down", x, -x / 3.0))).toDF("g", "x", "y")
    val out = Regression.linearTrend(d, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("up").getLong(2) == 333333L)
    assert(out("up").getLong(3) == 0L)
    assert(out("down").getLong(2) == -333333L)
  }

  test("linearTrend: zero x-variance fit is NULL, mean survives; nulls skipped") {
    val d = (Seq(("flat", Some(5), Some(7.0)), ("flat", Some(5), Some(9.0)),
      ("flat", Some(5), None), ("flat", None, Some(1.0))) ++
      (1 to 4).map(x => ("ok", Some(x), Some(x * 1.0)))).toDF("g", "x", "y")
    val out = Regression.linearTrend(d, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").getLong(1) == 2L) // null x or y rows never counted
    assert(out("flat").isNullAt(2) && out("flat").isNullAt(3))
    assert(out("flat").getLong(4) == 8000000L)
    assert(out("ok").getLong(2) == 1000000L)
  }

  test("welchTTest: known t and Satterthwaite df on constructed arms") {
    // A {1,2,3} vs B {2,3,4}: equal variance, t = -1/sqrt(2/3), df = 4
    val d = (Seq((true, 1.0), (true, 2.0), (true, 3.0),
      (false, 2.0), (false, 3.0), (false, 4.0)))
      .map { case (a, y) => ("g", a, y) }.toDF("g", "arm", "y")
    val r = Regression.welchTTest(d, Seq("g"), "arm", "y").collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 2000000L && r.getLong(4) == 3000000L)
    assert(r.getLong(5) == math.floor(-1.0 / math.sqrt(2.0 / 3.0) * 1e6).toLong)
    assert(r.getLong(6) == 4000000L)
  }

  test("welchTTest guards: tiny arm or zero variance yields NULL t/df") {
    val d = Seq(
      ("tiny", true, 1.0), ("tiny", false, 2.0), ("tiny", false, 3.0),
      ("const", true, 5.0), ("const", true, 5.0),
      ("const", false, 5.0), ("const", false, 5.0))
      .toDF("g", "arm", "y")
    val out = Regression.welchTTest(d, Seq("g"), "arm", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("tiny").isNullAt(5) && out("tiny").isNullAt(6))
    assert(out("const").isNullAt(5) && out("const").isNullAt(6))
    assert(out("const").getLong(3) == 5000000L) // means still defined
  }
}
