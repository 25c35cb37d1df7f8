package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("mannWhitney: doubled mid-ranks with ties give the exact U") {
    // A {1, 3}, B {2, 3}: ranks 1, 2, tied 3.5/3.5 → RA = 1 + 3.5 = 4.5
    // U_A = nA·nB + nA(nA+1)/2 − RA = 4 + 3 − 4.5 = 2.5 → u2_a = 5
    val d = Seq(("g", true, 1.0), ("g", true, 3.0),
      ("g", false, 2.0), ("g", false, 3.0)).toDF("g", "arm", "y")
    val r = Regression.mannWhitney(d, Seq("g"), "arm", "y").collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 5L)
    // tie-corrected sigma: Σ(t³−t) = 2³−2 = 6; σ² = (4/12)·(5 − 6/12) = 1.5
    val z = (2.5 - 2.0) / math.sqrt(1.5)
    assert(r.getLong(4) == math.floor(z * 1e6).toLong)
  }

  test("mannWhitney: all-tied group has zero sigma and NULL z") {
    val d = Seq(("g", true, 7.0), ("g", true, 7.0),
      ("g", false, 7.0), ("g", false, 7.0)).toDF("g", "arm", "y")
    val r = Regression.mannWhitney(d, Seq("g"), "arm", "y").collect().head
    assert(r.getLong(3) == 4L) // all mid-ranks 2.5 → RA2 = 10, u2 = 8+6−10
    assert(r.isNullAt(4))
  }

  test("cohenKappa: classic 2x2 table gives exact kappa") {
    // cells: xx=20, xy=5, yx=10, yy=15 → n=50, agree=35
    // E = 25·30 + 25·20 = 1250; κ = (35·50 − 1250)/(2500 − 1250) = 0.4
    val d = (Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y")))
      .map { case (a, b) => ("g", a, b) }.toDF("g", "a", "b")
    val r = Regression.cohenKappa(d, Seq("g"), "a", "b").collect().head
    assert(r.getLong(1) == 50L && r.getLong(2) == 35L)
    assert(r.getLong(3) == 400000L)
  }

  test("cohenKappa: both raters constant means p_e = 1 and NULL kappa") {
    val d = Seq.fill(3)(("g", "x", "x")).toDF("g", "a", "b")
    val r = Regression.cohenKappa(d, Seq("g"), "a", "b").collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.isNullAt(3))
  }

  test("cohenKappa: disjoint label sets agree never, kappa below zero") {
    // A always 'x', B always 'y' on half, 'x' on half: agree = 2 of 4
    // cells: (x,y)=2, (x,x)=2 → n=4, agree=2, E = 4·2 = 8 (cat x only)
    // κ = (8 − 8)/(16 − 8) = 0
    val d = (Seq.fill(2)(("g", "x", "y")) ++ Seq.fill(2)(("g", "x", "x")))
      .toDF("g", "a", "b")
    val r = Regression.cohenKappa(d, Seq("g"), "a", "b").collect().head
    assert(r.getLong(3) == 0L)
  }

  test("proportionZTest: known z on constructed rates; degenerate pool NULLs z") {
    // A: 2/4, B: 1/4 → pooled 3/8, z = 0.25 / sqrt(0.375·0.625·0.5)
    val d = (Seq.fill(2)(true) ++ Seq.fill(2)(false)).map(s => ("g", true, s))
      .++(Seq((("g"), false, true)) ++ Seq.fill(3)(("g", false, false)))
      .toDF("g", "arm", "success")
    val r = Regression.proportionZTest(d, Seq("g"), "arm", "success")
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((4L, 2L, 4L, 1L)))
    assert(r.getLong(5) == 500000L && r.getLong(6) == 250000L)
    val z = 0.25 / math.sqrt(0.375 * 0.625 * 0.5)
    assert(r.getLong(7) == math.floor(z * 1e6).toLong)

    val allWin = Seq(("g", true, true), ("g", false, true)).toDF("g", "arm", "success")
    val r2 = Regression.proportionZTest(allWin, Seq("g"), "arm", "success")
      .collect().head
    assert(r2.isNullAt(7)) // pooled rate 1.0 → zero se → no z
  }

  test("chiSquare: independent table scores 0; empty cells still contribute") {
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 10 }
      yield ("g", a, b)).toDF("g", "a", "b")
    val r = Regression.chiSquare(indep, Seq("g"), "a", "b").collect().head
    assert(r.getLong(1) == 0L && r.getLong(2) == 1L)

    // perfectly dependent 2×2 with two EMPTY cells: every cell deviates
    // by 5 from e=5 → χ² = 4·(25/5) = 20 (dropping empties would read 10)
    val dep = (Seq.fill(10)(("g", "x", "p")) ++ Seq.fill(10)(("g", "y", "q")))
      .toDF("g", "a", "b")
    val r2 = Regression.chiSquare(dep, Seq("g"), "a", "b").collect().head
    assert(r2.getLong(1) == 20000000L && r2.getLong(2) == 1L)
  }

  test("confusionStats: full label frame incl. never-predicted and hallucinated classes") {
    val d = (Seq.fill(3)(("x", "x")) ++ Seq(("x", "y")) ++
      Seq.fill(2)(("y", "y")) ++ Seq(("y", "x"), ("z", "x"), ("y", "w")))
      .map { case (a, p) => ("g", a, p) }.toDF("g", "actual", "pred")
    val out = Regression.confusionStats(d, Seq("g"), "actual", "pred")
      .collect().map(r => r.getString(1) -> r).toMap
    // x: actual 4, predicted 5 (3 tp + y→x + z→x)
    assert(out("x").getLong(2) == 4L && out("x").getLong(3) == 5L)
    assert(out("x").getLong(4) == 3L)
    assert(out("x").getLong(5) == 600000L)  // 3/5
    assert(out("x").getLong(6) == 750000L)  // 3/4
    assert(out("x").getLong(7) == 666666L)  // 6/9
    // y: actual 4 (incl. y→w), predicted 3
    assert(out("y").getLong(5) == 666666L && out("y").getLong(6) == 500000L)
    assert(out("y").getLong(7) == 571428L)  // 4/7
    // z never predicted: precision NULL, recall 0
    assert(out("z").isNullAt(5) && out("z").getLong(6) == 0L)
    assert(out("z").getLong(7) == 0L)
    // w never actual: recall NULL, precision 0
    assert(out("w").getLong(5) == 0L && out("w").isNullAt(6))
  }

  test("rocAuc: ties credit half; empty side yields NULL auc") {
    // pos {0.9, 0.8}, neg {0.7, 0.8} → U⁺ = 3.5, AUC = 0.875
    val d = Seq(("g", true, 0.9), ("g", true, 0.8),
      ("g", false, 0.7), ("g", false, 0.8),
      ("onesided", true, 1.0), ("onesided", true, 2.0))
      .toDF("g", "label", "score")
    val out = Regression.rocAuc(d, Seq("g"), "label", "score")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getLong(1) == 2L && out("g").getLong(2) == 2L)
    assert(out("g").getLong(3) == 7L) // 2·U⁺
    assert(out("g").getLong(4) == 875000L)
    assert(out("onesided").isNullAt(4))
  }

  test("rocAuc: perfect and inverted scorers hit the integer endpoints") {
    val perfect = Seq(("g", false, 0.1), ("g", false, 0.2),
      ("g", true, 0.8), ("g", true, 0.9)).toDF("g", "label", "score")
    assert(Regression.rocAuc(perfect, Seq("g"), "label", "score")
      .collect().head.getLong(4) == 1000000L)
    val inverted = Seq(("g", true, 0.1), ("g", false, 0.9))
      .toDF("g", "label", "score")
    assert(Regression.rocAuc(inverted, Seq("g"), "label", "score")
      .collect().head.getLong(4) == 0L)
  }

  test("calibrationReport: bin means, clamp at 1.0, and the exact ECE") {
    val d = Seq(("g", 0.1, false), ("g", 0.3, true), ("g", 0.3, false),
      ("g", 0.9, true), ("g", 1.0, true)).toDF("g", "score", "label")
    val out = Regression.calibrationReport(d, Seq("g"), "score", "label", 5)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out.keySet == Set(0L, 1L, 4L)) // 1.0 clamps into bin 4
    assert(out(0L).getLong(2) == 1L && out(0L).getLong(3) == 100000L &&
      out(0L).getLong(4) == 0L)
    assert(out(1L).getLong(3) == 300000L && out(1L).getLong(4) == 500000L)
    assert(out(4L).getLong(3) == 950000L && out(4L).getLong(4) == 1000000L)
    // ECE = (1·100000 + 2·200000 + 2·50000) div 5 = 120000, on every row
    assert(out.values.forall(_.getLong(5) == 120000L))
  }

  test("cuped: a perfectly predictive covariate removes its share of the difference") {
    // y = x + 10·[arm A]: θ = 1, Δx = 0 here so Δadj = Δy; ρ² from the
    // exact power sums = 4e8/4.04e10 → 9900 micro
    val d = Seq(("g", true, 1.0, 11.0), ("g", true, 2.0, 12.0),
      ("g", false, 1.0, 1.0), ("g", false, 2.0, 2.0))
      .toDF("g", "arm", "x", "y")
    val r = Regression.cuped(d, Seq("g"), "arm", "y", "x").collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 10000000L)  // Δy = 10 in 1e-4-unit·100
    assert(r.getLong(4) == 1000000L)   // θ = 1
    assert(r.getLong(5) == 10000000L)  // Δx = 0 → unchanged
    assert(r.getLong(6) == 9900L)
  }

  test("cuped: covariate imbalance is subtracted; zero x-variance guards") {
    // y = x with no treatment effect, but arm A saw x one unit higher:
    // the raw read Δy = 1 is pure covariate imbalance — θ = 1 and
    // Δadj = Δy − θ·Δx = 0, the correct no-effect answer
    val d = Seq(("g", true, 2.0, 2.0), ("g", true, 3.0, 3.0),
      ("g", false, 1.0, 1.0), ("g", false, 2.0, 2.0),
      ("flat", true, 5.0, 1.0), ("flat", true, 5.0, 2.0),
      ("flat", false, 5.0, 3.0), ("flat", false, 5.0, 4.0))
      .toDF("g", "arm", "x", "y")
    val out = Regression.cuped(d, Seq("g"), "arm", "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getLong(3) == 1000000L)
    assert(out("g").getLong(5) == 0L)
    assert(out("flat").getLong(3) == -2000000L) // raw diff still defined
    assert(out("flat").isNullAt(4) && out("flat").isNullAt(5) &&
      out("flat").isNullAt(6))
  }

  test("fleissKappa: hand-computed 4-item 3-rater table; incomplete items dropped") {
    // items (3 raters, cats a/b): aaa, aab, bbb, abb
    // P̄num = 6+2+6+2 = 16, D = 4·6 = 24 → P̄ = 2/3
    // T_a = T_b = 6, (Nn)² = 144, S = 72 → P_e = 1/2 → κ = 1/3
    val ratings = Seq("i1" -> Seq("a", "a", "a"), "i2" -> Seq("a", "a", "b"),
      "i3" -> Seq("b", "b", "b"), "i4" -> Seq("a", "b", "b"),
      "partial" -> Seq("a", "b")) // 2 ratings — must be dropped
    val d = ratings.flatMap { case (i, cs) => cs.map(("g", i, _)) }
      .toDF("g", "item", "cat")
    val r = Regression.fleissKappa(d, Seq("g"), "item", "cat", 3)
      .collect().head
    assert(r.getLong(1) == 4L) // kept items exclude the partial one
    assert(r.getLong(2) == 333333L)
  }

  test("fleissKappa: perfect per-item agreement is 1; a constant category is NULL") {
    val perfect = Seq("i1" -> "a", "i2" -> "b", "i3" -> "a")
      .flatMap { case (i, c) => Seq.fill(3)(("g", i, c)) }
      .toDF("g", "item", "cat")
    assert(Regression.fleissKappa(perfect, Seq("g"), "item", "cat", 3)
      .collect().head.getLong(2) == 1000000L)
    val constant = Seq("i1", "i2").flatMap(i => Seq.fill(3)(("g", i, "a")))
      .toDF("g", "item", "cat")
    assert(Regression.fleissKappa(constant, Seq("g"), "item", "cat", 3)
      .collect().head.isNullAt(2)) // P_e = 1 → undefined
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

  test("spearmanCorr: monotone ±1 endpoints and a hand-computed tie case") {
    val d = Seq(
      // perfectly increasing (nonlinear — Spearman sees only the order)
      ("up", 1.0, 1.0), ("up", 2.0, 4.0), ("up", 3.0, 9.0), ("up", 4.0, 100.0),
      // perfectly decreasing
      ("dn", 1.0, 9.0), ("dn", 2.0, 4.0), ("dn", 3.0, 1.0),
      // x = (1,1,2), y = (1,2,3): midranks x=(1.5,1.5,3), y=(1,2,3)
      //   ρ = 0.5·√3 → floor(866025.40…) = 866025
      ("tie", 1.0, 1.0), ("tie", 1.0, 2.0), ("tie", 2.0, 3.0))
      .toDF("g", "x", "y")
    val out = Regression.spearmanCorr(d, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("up").getLong(2) == 1000000L)
    assert(out("dn").getLong(2) == -1000000L)
    assert(out("tie").getLong(2) == 866025L)
  }

  test("spearmanCorr guards: constant variable or null rows yield NULL rho") {
    val d = Seq(
      ("const", 5.0, 1.0), ("const", 5.0, 2.0), ("const", 5.0, 3.0),
      ("nulls", 1.0, 1.0), ("nulls", 2.0, 2.0))
      .toDF("g", "x", "y")
      .union(Seq(("nulls", Option.empty[Double], Option(9.0)))
        .toDF("g", "x", "y"))
    val out = Regression.spearmanCorr(d, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("const").isNullAt(2)) // zero x-variance
    assert(out("nulls").getLong(1) == 2L) // null row dropped from n
    assert(out("nulls").getLong(2) == 1000000L)
  }

  test("normalPValueMicro: textbook quantiles land on their micro p-values") {
    val d = Seq(0L, 1000000L, -1000000L, 1959964L, 4000000L)
      .toDF("z_micro")
      .union(Seq(Option.empty[Long]).toDF("z_micro"))
    val out = d.select(col("z_micro"),
        Regression.normalPValueMicro(col("z_micro")).as("p"))
      .collect()
      .map(r => Option(r.get(0)) -> Option(r.get(1))).toMap
    assert(out(Some(0L)) == Some(1000000L)) // z = 0 → p = 1
    assert(out(Some(1000000L)) == Some(317310L)) // 2(1−Φ(1)) = .3173105
    assert(out(Some(-1000000L)) == Some(317310L)) // two-sided symmetry
    assert(out(Some(1959964L)) == Some(50000L)) // the 5% critical value
    assert(out(Some(4000000L)) == Some(63L)) // far tail stays positive
    assert(out(None).isEmpty) // degenerate test propagates NULL
  }

  test("bhAdjust: step-up running min, the cap at 1, and null exclusion") {
    val d = Seq(
      ("a", Some(10000L)), ("b", Some(20000L)), ("c", Some(30000L)),
      ("d", Some(800000L)), ("e", None)).toDF("k", "p_micro")
    val out = Regression.bhAdjust(d, "p_micro", Seq("k"))
      .collect()
      .map(r => r.getString(0) ->
        ((Option(r.get(2)), Option(r.get(3))))).toMap // (p_adj, rank)
    // m = 4 (null excluded): raw = (40000, 40000, 40000, 800000);
    // reverse running min leaves every prefix at 40000
    assert(out("a") == ((Some(40000L), Some(1L))))
    assert(out("b") == ((Some(40000L), Some(2L))))
    assert(out("c") == ((Some(40000L), Some(3L))))
    assert(out("d") == ((Some(800000L), Some(4L))))
    assert(out("e") == ((None, None)))
    // step-up monotonicity: rank 1's raw 1.8 exceeds 1 but the reverse
    // min pulls it down to rank 2's own p (the largest p IS its adj)
    val hi = Regression.bhAdjust(
        Seq(("x", 900000L), ("y", 950000L)).toDF("k", "p_micro"),
        "p_micro", Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(hi("x") == 950000L && hi("y") == 950000L)
  }

  test("olsTwoFeature: recovers an exact plane; R² = 1") {
    // y = 2 + 3x₁ + 5x₂ exactly on five non-collinear points
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, 1.0))
    val d = pts.map { case (x1, x2) => ("g", x1, x2, 2.0 + 3 * x1 + 5 * x2) }
      .toDF("g", "x1", "x2", "y")
    val r = Regression.olsTwoFeature(d, Seq("g"), "x1", "x2", "y")
      .collect().head
    assert(r.getLong(1) == 5L)
    assert(r.getLong(2) == 2000000L) // b0
    assert(r.getLong(3) == 3000000L) // b1
    assert(r.getLong(4) == 5000000L) // b2
    assert(r.getLong(5) == 1000000L) // R²
  }

  test("olsTwoFeature guards: collinear or constant features yield NULL fits") {
    val collinear = (1 to 6).map(i => ("col", i.toDouble, 2.0 * i, i * 7.0))
      .toDF("g", "x1", "x2", "y")
    val constant = (1 to 6).map(i => ("cst", i.toDouble, 4.0, i * 7.0))
      .toDF("g", "x1", "x2", "y")
    val out = Regression.olsTwoFeature(collinear.union(constant),
        Seq("g"), "x1", "x2", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("col").isNullAt(2) && out("col").isNullAt(3))
    assert(out("cst").isNullAt(2) && out("cst").isNullAt(4))
  }

  test("prCurve operating points match hand-computed tp/fp/fn") {
    // scores 0.05/0.15/0.25/0.35 land in bins 0..3 of 10; labels +,-,+,+
    val df = Seq((0.05, true), (0.15, false), (0.25, true), (0.35, true))
      .map { case (s, y) => ("g", s, y) }.toDF("grp", "score", "y")
    val out = Regression.prCurve(df, Seq("grp"), "y", "score", nBins = 10)
      .orderBy("thr_bin").collect()
    assert(out.length == 4)
    def at(i: Int, c: String) = out(i).getLong(out(i).fieldIndex(c))
    // thr 0: everything predicted positive
    assert(at(0, "tp") == 3L && at(0, "fp") == 1L && at(0, "fn") == 0L)
    assert(at(0, "precision_micro") == 750000L && at(0, "recall_micro") == 1000000L)
    // thr 2: bins {2,3} → tp=2 fp=0 fn=1; F1 = 4/5
    assert(at(2, "tp") == 2L && at(2, "fp") == 0L && at(2, "fn") == 1L)
    assert(at(2, "precision_micro") == 1000000L && at(2, "f1_micro") == 800000L)
  }

  test("prCurve recall is null for a group with no positives") {
    val df = Seq(("g", 0.2, false), ("g", 0.8, false)).toDF("grp", "score", "y")
    val out = Regression.prCurve(df, Seq("grp"), "y", "score", nBins = 2)
      .collect()
    assert(out.forall(r => r.isNullAt(r.fieldIndex("recall_micro"))))
    assert(out.forall(r => r.getLong(r.fieldIndex("precision_micro")) == 0L))
  }

  private def tauRef(xs: Seq[(Long, Long)]): (Long, Long, Long, Option[Long]) = {
    val ps = for (i <- xs.indices; j <- xs.indices if i < j)
      yield (xs(i)._1 - xs(j)._1, xs(i)._2 - xs(j)._2)
    val c = ps.count(p => p._1 * p._2 > 0).toLong
    val d = ps.count(p => p._1 * p._2 < 0).toLong
    val nx = ps.count(_._1 == 0).toLong
    val ny = ps.count(_._2 == 0).toLong
    val n0 = ps.size.toLong
    val tau = if (n0 - nx > 0 && n0 - ny > 0)
      Some(math.floor((c - d).toDouble * 1e6 /
        math.sqrt((n0 - nx).toDouble * (n0 - ny).toDouble)).toLong)
    else None
    (c, d, n0, tau)
  }

  test("kendallTau matches the all-pairs reference, ties corrected") {
    // heavy x-ties, one y-tie, mixed signs
    val xs = Seq((3L, 10L), (3L, 20L), (5L, 20L), (7L, 5L), (9L, 30L), (9L, 1L))
    val df = xs.zipWithIndex.map { case ((x, y), i) => ("g", i, x, y) }
      .toDF("grp", "id", "x", "y")
    val r = Regression.kendallTau(df, Seq("grp"), "id", "x", "y")
      .collect().head
    val (c, d, n0, tau) = tauRef(xs)
    assert(r.getLong(r.fieldIndex("n_pairs")) == n0)
    assert(r.getLong(r.fieldIndex("concordant")) == c)
    assert(r.getLong(r.fieldIndex("discordant")) == d)
    assert(r.getLong(r.fieldIndex("tau_micro")) == tau.get)
  }

  test("kendallTau: perfect monotone = ±1e6; constant side is NULL") {
    val up = (1 to 5).map(i => ("up", i, i.toLong, (i * 10).toLong))
    val dn = (1 to 5).map(i => ("dn", i, i.toLong, (100 - i).toLong))
    val ct = (1 to 5).map(i => ("ct", i, i.toLong, 7L))
    val out = Regression.kendallTau((up ++ dn ++ ct)
        .toDF("grp", "id", "x", "y"), Seq("grp"), "id", "x", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out("up").contains(1000000L))
    assert(out("dn").contains(-1000000L))
    assert(out("ct").isEmpty)
  }

  test("theilSen: hand median, exact negative-slope flooring") {
    // slopes for x=1..4, y=(2,1,7,4): pairs (1,2)=-1e6, (1,3)=2.5e6,
    // (1,4)=666666(.67->floor), (2,3)=6e6, (2,4)=1.5e6, (3,4)=-3e6
    // sorted: -3e6, -1e6, 666666, 1.5e6, 2.5e6, 6e6 -> lower median
    // rank (6+1) div 2 = 3 -> 666666
    val df = Seq(("g", 1L, 2L), ("g", 2L, 1L), ("g", 3L, 7L), ("g", 4L, 4L))
      .toDF("grp", "x", "y")
    val r = Regression.theilSen(df, Seq("grp"), "x", "y").collect().head
    assert(r.getLong(r.fieldIndex("n_slopes")) == 6L)
    assert(r.getLong(r.fieldIndex("slope_micro")) == 666666L)
  }

  test("theilSen: x-ties carry no slope; all-tied group vanishes") {
    val df = Seq(("g", 1L, 1L), ("g", 1L, 9L), ("g", 2L, 3L),
      ("h", 5L, 1L), ("h", 5L, 2L)).toDF("grp", "x", "y")
    val out = Regression.theilSen(df, Seq("grp"), "x", "y").collect()
    assert(out.length == 1 && out.head.getString(0) == "g")
    // pairs: (1,1)->(2,3) slope 2e6 and (1,9)->(2,3) slope -6e6;
    // lower median rank 1 -> -6e6
    assert(out.head.getLong(2) == -6000000L)
  }

  test("theilSen shrugs off the outlier that drags least squares") {
    // clean slope 1; one wild final point
    val pts = (1 to 9).map(i => ("g", i.toLong, i.toLong)) :+ (("g", 10L, 1000L))
    val df = pts.toDF("grp", "x", "y")
    val ts = Regression.theilSen(df, Seq("grp"), "x", "y").collect().head
    assert(ts.getLong(ts.fieldIndex("slope_micro")) == 1000000L)
    val lt = Regression.linearTrend(df, Seq("grp"), "x", "y")
      .collect().head
    assert(lt.getLong(lt.fieldIndex("slope_micro")) > 30000000L)
  }

  test("mantelHaenszel: single stratum reduces to the plain 2x2") {
    // a=6 b=4 c=3 d=7, n=20
    def rows(k: Int, arm: Boolean, out: Boolean) =
      Seq.fill(k)(("g", "s1", arm, out))
    val df = (rows(6, true, true) ++ rows(4, true, false) ++
      rows(3, false, true) ++ rows(7, false, false))
      .toDF("grp", "st", "arm", "out")
    val r = Regression.mantelHaenszel(df, Seq("grp"), Seq("st"),
      "arm", "out").collect().head
    assert(r.getAs[Long]("n") == 20L && r.getAs[Long]("n_strata") == 1L)
    // OR terms: ad/n = 42/20 -> 2100000; bc/n = 12/20 -> 600000
    assert(r.getAs[Long]("or_micro") == 2100000L * 1000000L / 600000L)
    // E = 10*9/20 = 4.5 -> 4500000; V = 10*10*9*11/(400*19)
    val e = 10L * 9L * 1000000L / 20L
    val v = 10L * 10L * 9L * 11L * 1000000L / (20L * 20L * 19L)
    val z = math.floor((6L * 1000000L - e).toDouble * 1000.0 /
      math.sqrt(v.toDouble)).toLong
    assert(r.getAs[Long]("z_micro") == z)
  }

  test("mantelHaenszel survives Simpson's reversal that fools the crude OR") {
    // stratum A: arm mostly treated, high base rate; stratum B inverse.
    // Within EACH stratum the arm HURTS (OR < 1); crude pooling says
    // it helps. CMH must report OR < 1e6.
    def rows(st: String, k: Int, arm: Boolean, out: Boolean) =
      Seq.fill(k)(("g", st, arm, out))
    val df = (
      rows("A", 70, true, true) ++ rows("A", 30, true, false) ++
        rows("A", 9, false, true) ++ rows("A", 1, false, false) ++
        rows("B", 1, true, true) ++ rows("B", 9, true, false) ++
        rows("B", 30, false, true) ++ rows("B", 70, false, false))
      .toDF("grp", "st", "arm", "out")
    val stratified = Regression.mantelHaenszel(df, Seq("grp"), Seq("st"),
      "arm", "out").collect().head.getAs[Long]("or_micro")
    val crude = Regression.mantelHaenszel(
      df.withColumn("st", org.apache.spark.sql.functions.lit("all")),
      Seq("grp"), Seq("st"), "arm", "out")
      .collect().head.getAs[Long]("or_micro")
    assert(stratified < 1000000L, s"stratified OR $stratified")
    assert(crude > 1000000L, s"crude OR $crude")
  }

  test("mantelHaenszel: empty margins yield NULL OR and z") {
    // outcome always true -> no discordant mass, zero variance
    val df = Seq(("g", "s", true, true), ("g", "s", false, true))
      .toDF("grp", "st", "arm", "out")
    val r = Regression.mantelHaenszel(df, Seq("grp"), Seq("st"),
      "arm", "out").collect().head
    assert(r.isNullAt(r.fieldIndex("or_micro")))
    assert(r.isNullAt(r.fieldIndex("z_micro")))
  }

  test("mannKendall: hand-computed S, tie-corrected variance, trend labels") {
    // series g: 1,2,2,4 -> S = +1+1+1 +0+1 +1 = 5; ties: one group of 2
    // var18 = 4*3*13 - 2*1*9 = 156 - 18 = 138
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 2L), ("g", 4L, 4L))
      .toDF("grp", "t", "x")
    val r = Regression.mannKendall(df, Seq("grp"), "t", "x").collect().head
    assert(r.getLong(r.fieldIndex("n")) == 4L)
    assert(r.getLong(r.fieldIndex("s_stat")) == 5L)
    assert(r.getLong(r.fieldIndex("var18")) == 138L)
    val expZ = math.floor(4.0 * 1e6 / math.sqrt(138.0 / 18.0)).toLong
    assert(r.getLong(r.fieldIndex("z_micro")) == expZ)
  }

  test("mannKendall: strong monotone trends get labeled; flat is null") {
    val up = (1 to 12).map(i => ("up", i.toLong, i.toLong))
    val dn = (1 to 12).map(i => ("dn", i.toLong, (50 - i).toLong))
    val ct = (1 to 12).map(i => ("ct", i.toLong, 7L))
    val out = Regression.mannKendall((up ++ dn ++ ct)
        .toDF("grp", "t", "x"), Seq("grp"), "t", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("up").getString(out("up").fieldIndex("trend")) == "increasing")
    assert(out("dn").getString(out("dn").fieldIndex("trend")) == "decreasing")
    val flat = out("ct")
    assert(flat.isNullAt(flat.fieldIndex("z_micro")) &&
      flat.isNullAt(flat.fieldIndex("p_micro")) &&
      flat.getString(flat.fieldIndex("trend")) == "no trend")
    assert(flat.getLong(flat.fieldIndex("var18")) == 0L)
  }

  test("kendallTau: null coordinates drop; single-row groups emit nothing") {
    val df = Seq(("g", 1, Some(1L), Some(2L)), ("g", 2, None, Some(3L)),
      ("h", 1, Some(1L), Some(1L)))
      .toDF("grp", "id", "x", "y")
    val out = Regression.kendallTau(df, Seq("grp"), "id", "x", "y").collect()
    assert(out.isEmpty)
  }

  test("kruskalWallis: singleton arms make the floors exact; hand H") {
    // arms {1},{2},{3}: ranks 1,2,3 → doubled 2,4,6; terms 4//4, 16//4,
    // 36//4 = 1+4+9 = 14 (exact); H = 12·14/(3·4) − 3·4 = 2.0
    val d = Seq(("g", "a", 1.0), ("g", "b", 2.0), ("g", "c", 3.0))
      .toDF("grp", "arm", "y")
    val r = Regression.kruskalWallis(d, Seq("grp"), "arm", "y")
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 2000000L)
    assert(r.getLong(4) == 2000000L) // no ties → correction is 1
  }

  test("kruskalWallis: tie correction divides H by 1 − Σ(t³−t)/(n³−n)") {
    // A={1,1}, B={2,2}: doubled midranks 3,3,7,7 → ra2 6,14; terms
    // 36//8=4, 196//8=24 → S=28; H = 12·28/20 − 15 = 1.8; every row in a
    // 2-tie contributes t²−1=3 → 12; corr = 1 − 12/60 = 0.8 → H' = 2.25
    val d = Seq(("g", "a", 1.0), ("g", "a", 1.0), ("g", "b", 2.0),
      ("g", "b", 2.0)).toDF("grp", "arm", "y")
    val r = Regression.kruskalWallis(d, Seq("grp"), "arm", "y")
      .collect().head
    assert(r.getLong(3) == 1800000L)
    assert(r.getLong(4) == 2250000L)
  }

  test("kruskalWallis: an all-tied group zeroes the correction → NULL H'") {
    val d = Seq(("g", "a", 5.0), ("g", "a", 5.0)).toDF("grp", "arm", "y")
    val r = Regression.kruskalWallis(d, Seq("grp"), "arm", "y")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("h_tie_micro")))
  }

  test("kruskalWallis: a single-arm group has no contrast → NULL H " +
      "(the anovaF guard)") {
    // one arm, two distinct values: floor loss would otherwise report a
    // meaningless (even negative) H for a question that can't be asked
    val d = Seq(("g", "only", 1.0), ("g", "only", 2.0))
      .toDF("grp", "arm", "y")
    val r = Regression.kruskalWallis(d, Seq("grp"), "arm", "y")
      .collect().head
    assert(r.getLong(r.fieldIndex("k_arms")) == 1L)
    assert(r.isNullAt(r.fieldIndex("h_micro")))
    assert(r.isNullAt(r.fieldIndex("h_tie_micro")))
  }

  test("anovaF: two clean arms give the textbook F = 13.5") {
    // A={1,2,3}, B={4,5,6}: SSB = 13.5, SSW = 4 (y² units), df 1 and 4
    // → F = (13.5/1)/(4/4) = 13.5
    val d = (Seq(1, 2, 3).map(y => ("g", "a", y.toDouble)) ++
      Seq(4, 5, 6).map(y => ("g", "b", y.toDouble))).toDF("grp", "arm", "y")
    val r = Regression.anovaF(d, Seq("grp"), "arm", "y").collect().head
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 4L)
    assert(r.getLong(5) == 13500000L)
  }

  test("anovaF guards: one arm, or zero within-variance, yields NULL F") {
    val one = Seq(("g", "a", 1.0), ("g", "a", 2.0)).toDF("grp", "arm", "y")
    val r1 = Regression.anovaF(one, Seq("grp"), "arm", "y").collect().head
    assert(r1.isNullAt(r1.fieldIndex("f_micro")))
    val const = Seq(("g", "a", 1.0), ("g", "a", 1.0), ("g", "b", 2.0),
      ("g", "b", 2.0)).toDF("grp", "arm", "y")
    val r2 = Regression.anovaF(const, Seq("grp"), "arm", "y").collect().head
    assert(r2.isNullAt(r2.fieldIndex("f_micro")))
  }

  test("pettittTest: level shift located at the true changepoint") {
    // x = 1,2,3,10,11,12 → U = −5,−8,−9,−8,−5 → K = 9 at τ = 3
    val d = Seq(1L, 2L, 3L, 10L, 11L, 12L).zipWithIndex
      .map { case (x, i) => ("g", (i + 1).toLong, x) }
      .toDF("grp", "t", "x")
    val r = Regression.pettittTest(d, Seq("grp"), "t", "x").collect().head
    assert(r.getLong(1) == 6L)
    assert(r.getLong(2) == 9L)
    assert(r.getLong(3) == 3L)
    assert(!r.getBoolean(r.fieldIndex("signif"))) // n = 6 is far from 0.05
  }

  test("pettittTest: |U| ties elect the EARLIEST τ; n=1 reports NULLs") {
    // x = 1,2,2,1 → U = −2,0,2 → K = 2 tied at τ∈{1,3} → cp_t = 1
    val d = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 2L), ("g", 4L, 1L),
      ("solo", 1L, 9L)).toDF("grp", "t", "x")
    val out = Regression.pettittTest(d, Seq("grp"), "t", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getLong(2) == 2L && out("g").getLong(3) == 1L)
    val solo = out("solo")
    assert(solo.getLong(1) == 1L && solo.isNullAt(2) && solo.isNullAt(3) &&
      solo.isNullAt(solo.fieldIndex("signif")))
  }

  test("brownForsythe: hand F on |y − lower-median|; equal spreads ≈ 0") {
    // A = {1,2,3,4,10}: med 3 → z = {2,1,0,1,7}; B = {5,…}: z = 0
    // → SSB = 1.21e9, SSW = 3.08e9 (quanta²), F = 9.68/3.08
    val d = (Seq(1, 2, 3, 4, 10).map(y => ("g", "a", y.toDouble)) ++
      Seq.fill(5)(("g", "b", 5.0))).toDF("grp", "arm", "y")
    val r = Regression.brownForsythe(d, Seq("grp"), "arm", "y")
      .collect().head
    assert(r.getLong(1) == 10L && r.getLong(2) == 2L)
    assert(r.getLong(r.fieldIndex("f_micro")) == 3142857L)
  }

  test("brownForsythe: identical-spread arms give F = 0; " +
      "zero-deviation arms give NULL") {
    val same = (Seq(1, 3).map(y => ("g", "a", y.toDouble)) ++
      Seq(11, 13).map(y => ("g", "b", y.toDouble))).toDF("grp", "arm", "y")
    val r1 = Regression.brownForsythe(same, Seq("grp"), "arm", "y")
      .collect().head
    assert(r1.getLong(r1.fieldIndex("f_micro")) == 0L)
    val flat = Seq(("g", "a", 2.0), ("g", "a", 2.0), ("g", "b", 7.0),
      ("g", "b", 7.0)).toDF("grp", "arm", "y")
    val r2 = Regression.brownForsythe(flat, Seq("grp"), "arm", "y")
      .collect().head
    assert(r2.isNullAt(r2.fieldIndex("f_micro"))) // all z = 0 → SSW = 0
  }

  test("cochranArmitage: hand z on a clean dose-response; strong trend " +
      "is significant") {
    // t=0,1,2 with (n,r) = (10,1),(10,5),(10,9): num = 240,
    // z = 240/√(135000/30) = 3.5777… → 3577708 micro
    val d = (Seq.fill(1)(true) ++ Seq.fill(9)(false)).map(s => ("g", 0L, s)) ++
      (Seq.fill(5)(true) ++ Seq.fill(5)(false)).map(s => ("g", 1L, s)) ++
      (Seq.fill(9)(true) ++ Seq.fill(1)(false)).map(s => ("g", 2L, s))
    val r = Regression.cochranArmitage(d.toDF("grp", "t", "s"),
      Seq("grp"), "t", "s").collect().head
    assert(r.getLong(1) == 30L && r.getLong(2) == 15L)
    assert(r.getLong(r.fieldIndex("z_micro")) == 3577708L)
    assert(r.getLong(r.fieldIndex("p_micro")) < 1000L) // p ≈ 0.00035
  }

  test("cochranArmitage guards: all-success, all-failure, or a single " +
      "score level yield NULL z") {
    val d = (Seq(("all", 0L, true), ("all", 1L, true)) ++
      Seq(("none", 0L, false), ("none", 1L, false)) ++
      Seq(("one", 3L, true), ("one", 3L, false))).toDF("grp", "t", "s")
    val out = Regression.cochranArmitage(d, Seq("grp"), "t", "s")
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("all", "none", "one").foreach { k =>
      assert(out(k).isNullAt(out(k).fieldIndex("z_micro")), k)
      assert(out(k).isNullAt(out(k).fieldIndex("p_micro")), k)
    }
  }

  test("rankingMetrics: perfect ranking hits the 10⁶ endpoints") {
    val d = Seq(("q", 1L, 2L), ("q", 2L, 1L), ("q", 3L, 0L))
      .toDF("grp", "rnk", "rel")
    val r = Regression.rankingMetrics(d, Seq("grp"), "rnk", "rel", k = 10)
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getLong(r.fieldIndex("mrr_micro")) == 1000000L)
    assert(r.getLong(r.fieldIndex("ndcg_micro")) == 1000000L)
    assert(r.getLong(r.fieldIndex("ap_micro")) == 1000000L)
  }

  test("rankingMetrics: bottom-ranked single hit — exact thirds, NDCG ½") {
    // only rank 3 relevant of 3: MRR = AP = ⌊10⁶/3⌋; DCG uses ln4 =
    // 2·ln2 so NDCG lands exactly on 500000
    val d = Seq(("q", 1L, 0L), ("q", 2L, 0L), ("q", 3L, 1L))
      .toDF("grp", "rnk", "rel")
    val r = Regression.rankingMetrics(d, Seq("grp"), "rnk", "rel", k = 10)
      .collect().head
    assert(r.getLong(r.fieldIndex("mrr_micro")) == 333333L)
    assert(r.getLong(r.fieldIndex("ndcg_micro")) == 500000L)
    assert(r.getLong(r.fieldIndex("ap_micro")) == 333333L)
  }

  test("rankingMetrics: no relevant docs → zero MRR/AP, NULL NDCG; " +
      "relevance beyond k is invisible to MRR/AP but counts in n_rel") {
    val d = Seq(("none", 1L, 0L), ("none", 2L, 0L),
      ("far", 1L, 0L), ("far", 2L, 1L)).toDF("grp", "rnk", "rel")
    val out = Regression.rankingMetrics(d, Seq("grp"), "rnk", "rel", k = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val none = out("none")
    assert(none.getLong(none.fieldIndex("mrr_micro")) == 0L)
    assert(none.isNullAt(none.fieldIndex("ndcg_micro")))
    assert(none.getLong(none.fieldIndex("ap_micro")) == 0L)
    val far = out("far")
    assert(far.getLong(far.fieldIndex("n_rel")) == 1L)
    assert(far.getLong(far.fieldIndex("mrr_micro")) == 0L)
    assert(far.getLong(far.fieldIndex("ap_micro")) == 0L)
  }

  test("operatingPoint: lowest threshold meeting target precision wins; " +
      "no-positive groups report NULL") {
    // desc scan: prec(≥4)=1, prec(≥3)=1/2, prec(≥2)=2/3, prec(≥1)=1/2
    // → at target 0.6 the qualifying thresholds are 4 and 2; pick 2
    val d = Seq(("g", 4.0, true), ("g", 3.0, false), ("g", 2.0, true),
      ("g", 1.0, false), ("z", 5.0, false), ("z", 6.0, false))
      .toDF("grp", "score", "lbl")
    val out = Regression.operatingPoint(d, Seq("grp"), "lbl", "score",
        targetPrecisionMicro = 600000L)
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getLong(g.fieldIndex("thr_q4")) == 20000L)
    assert(g.getLong(g.fieldIndex("tp")) == 2L)
    assert(g.getLong(g.fieldIndex("fp")) == 1L)
    assert(g.getLong(g.fieldIndex("prec_micro")) == 666666L)
    assert(g.getLong(g.fieldIndex("recall_micro")) == 1000000L)
    val z = out("z")
    assert(z.isNullAt(z.fieldIndex("thr_q4")))
  }

  test("subclassifiedAte: size-weighted within-stratum differences, " +
      "hand ATE") {
    // two strata of 4 (x-ntile): s1 diff = 11 − 1 = 10, s2 diff = 20 − 0
    // → ATE = (4·10 + 4·20)/8 = 15 y-units = 15·10¹⁰ micro-quanta
    val d = Seq(
      ("g", 1L, true, 1L, 10.0), ("g", 2L, true, 2L, 12.0),
      ("g", 3L, false, 3L, 0.0), ("g", 4L, false, 4L, 2.0),
      ("g", 5L, true, 5L, 20.0), ("g", 6L, false, 6L, 0.0),
      ("g", 7L, false, 7L, 0.0), ("g", 8L, false, 8L, 0.0))
      .toDF("grp", "id", "t", "x", "y")
    val r = Regression.subclassifiedAte(d, Seq("grp"), "id", "t", "x", "y",
      nStrata = 2).collect().head
    assert(r.getLong(r.fieldIndex("n")) == 8L)
    assert(r.getLong(r.fieldIndex("n_strata_used")) == 2L)
    assert(r.getLong(r.fieldIndex("ate_micro_q4")) == 150000000000L)
  }

  test("subclassifiedAte: strata missing an arm are excluded; one-arm " +
      "groups report NULL") {
    val d = Seq(("g", 1L, true, 1L, 5.0), ("g", 2L, true, 2L, 7.0))
      .toDF("grp", "id", "t", "x", "y")
    val r = Regression.subclassifiedAte(d, Seq("grp"), "id", "t", "x", "y",
      nStrata = 2).collect().head
    assert(r.getLong(r.fieldIndex("n_strata_used")) == 0L)
    assert(r.isNullAt(r.fieldIndex("ate_micro_q4")))
  }

  test("conformalCalibration: q̂ is the independently recomputed order " +
      "statistic; halves partition the rows") {
    // independent replica of the seeded split (md5 first 16 bits, % 2)
    def isCal(id: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"conf:$id".getBytes("UTF-8"))
      val h16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      h16 % 2 == 0
    }
    val scores = (1L to 200L).map(i => ("g", i, (i * 7 % 101).toDouble))
    val out = Regression.conformalCalibration(
      scores.toDF("grp", "id", "score"), Seq("grp"), "id", "score",
      covPct = 90, seed = "conf").collect().head
    val cal = scores.filter(r => isCal(r._2)).map(r => (r._3 * 10000).toLong)
      .sorted
    val ev = scores.filterNot(r => isCal(r._2))
      .map(r => (r._3 * 10000).toLong)
    assert(out.getLong(out.fieldIndex("n_cal")) == cal.length)
    assert(out.getLong(out.fieldIndex("n_eval")) == ev.length)
    val k = ((cal.length + 1) * 90 + 99) / 100
    assert(out.getLong(out.fieldIndex("k")) == k)
    val qhat = cal(k.toInt - 1)
    assert(out.getLong(out.fieldIndex("qhat_q4")) == qhat)
    val cov = ev.count(_ <= qhat) * 1000000L / ev.length
    assert(out.getLong(out.fieldIndex("coverage_micro")) == cov)
  }

  test("conformalCalibration: a tiny calibration half means q̂ = ∞ " +
      "(NULL, full coverage)") {
    // 2 rows: whichever lands in cal has k = ⌈3·0.9⌉ = 3 > 1 → NULL q̂
    val d = Seq(("g", 1L, 5.0), ("g", 2L, 7.0), ("g", 4L, 6.0))
      .toDF("grp", "id", "score")
    val rows = Regression.conformalCalibration(d, Seq("grp"), "id",
      "score", covPct = 90).collect()
    rows.foreach { r =>
      if (r.isNullAt(r.fieldIndex("qhat_q4")) &&
          r.getLong(r.fieldIndex("n_eval")) > 0L)
        assert(r.getLong(r.fieldIndex("coverage_micro")) == 1000000L)
    }
  }

  test("conformalCalibration: groups with an empty half still report " +
      "(degenerate, not absent)") {
    // id 2 is NOT calibration under the default seed (md5('conf:2')
    // first 16 bits are odd), id 4 IS — so "evonly" has an empty
    // calibration half and "calonly" an empty eval half; both groups
    // must still appear with honest zero counts.
    val d = Seq(("evonly", 2L, 5.0), ("calonly", 4L, 6.0))
      .toDF("grp", "id", "score")
    val out = Regression.conformalCalibration(d, Seq("grp"), "id",
      "score", covPct = 90).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("evonly", "calonly"))
    val evOnly = out("evonly")
    assert(evOnly.getLong(evOnly.fieldIndex("n_cal")) == 0L)
    assert(evOnly.getLong(evOnly.fieldIndex("n_eval")) == 1L)
    assert(evOnly.isNullAt(evOnly.fieldIndex("qhat_q4")))
    // empty calibration half -> q̂ = +∞ -> full coverage
    assert(evOnly.getLong(evOnly.fieldIndex("coverage_micro")) == 1000000L)
    val calOnly = out("calonly")
    assert(calOnly.getLong(calOnly.fieldIndex("n_cal")) == 1L)
    assert(calOnly.getLong(calOnly.fieldIndex("n_eval")) == 0L)
    // nothing to measure coverage on -> NULL, distinguishable from 0
    assert(calOnly.isNullAt(calOnly.fieldIndex("coverage_micro")))
  }

  test("minDetectableEffect: hand variance and the pinned z-sum; " +
      "degenerate groups NULL") {
    // {0, 2}: var = 10000 cents², MDE = ⌊2801585·√(2·10⁴/2)⌋ = 2801585·100
    val d = Seq(("g", 0.0), ("g", 2.0), ("flat", 3.0), ("flat", 3.0))
      .toDF("grp", "y")
    val out = Regression.minDetectableEffect(d, Seq("grp"), "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getLong(out("g").fieldIndex("var_cents2")) == 10000L)
    assert(out("g").getLong(out("g").fieldIndex("mde_microcents")) ==
      280158500L)
    assert(out("flat").isNullAt(out("flat").fieldIndex("mde_microcents")))
  }

  test("liftDeciles: concentrated conversions produce the classic curve") {
    // 10 users, scores 10..1, conversions at score-ranks 1,2,5; 5 tiles
    // of 2 → rates 10⁶, 0, 5·10⁵, 0, 0; cumulative lift ends at 10⁶
    val d = (1 to 10).map(i =>
      ("g", i.toLong, (11 - i).toDouble, Set(1, 2, 5).contains(i)))
      .toDF("grp", "id", "score", "conv")
    val out = Regression.liftDeciles(d, Seq("grp"), "id", "score", "conv",
        nTiles = 5)
      .collect().map(r => r.getLong(r.fieldIndex("tile")) -> r).toMap
    assert(out(1).getLong(out(1).fieldIndex("rate_micro")) == 1000000L)
    assert(out(3).getLong(out(3).fieldIndex("rate_micro")) == 500000L)
    assert(out(1).getLong(out(1).fieldIndex("cum_lift_micro")) == 3333333L)
    assert(out(2).getLong(out(2).fieldIndex("cum_lift_micro")) == 1666666L)
    assert(out(5).getLong(out(5).fieldIndex("cum_lift_micro")) == 1000000L)
  }

  test("liftDeciles: id breaks score ties; zero conversions → NULL lift") {
    val d = Seq(("g", 2L, 5.0, false), ("g", 1L, 5.0, false),
      ("g", 3L, 1.0, false)).toDF("grp", "id", "score", "conv")
    val out = Regression.liftDeciles(d, Seq("grp"), "id", "score", "conv",
        nTiles = 2)
      .collect().map(r => r.getLong(r.fieldIndex("tile")) -> r).toMap
    assert(out(1).getLong(out(1).fieldIndex("n")) == 2L) // ids 1,2 by tie-break
    assert(out(2).getLong(out(2).fieldIndex("n")) == 1L)
    assert(out(1).isNullAt(out(1).fieldIndex("cum_lift_micro")))
  }
}
