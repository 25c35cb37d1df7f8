package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the causal/uplift readouts against
  * independent local folds: CUPED's pooled-theta adjustment tree,
  * Mantel–Haenszel's per-stratum cleared odds/expectation/variance
  * terms, two-feature OLS by Cramer's rule on cleared normal equations,
  * and lift deciles with ntile's exact remainder placement. Seeds are
  * pinned so every trial reproduces.
  */
class RegressionFuzz6Spec extends SparkSpec {
  import spark.implicits._

  test("fuzz: cuped matches the exact theta-adjustment tree") {
    for (trial <- 0 until 4) {
      val rnd = new Random(16000 + trial)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        val constX = g == 0 // zero var(x) -> NULL theta
        (0 until 4 + rnd.nextInt(25)).map { _ =>
          val arm: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null else rnd.nextBoolean()
          val x: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else if (constX) 1.5 else (rnd.nextInt(801) - 400) / 16.0
          val y: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(801) - 400) / 16.0
          (s"g$g", arm, y, x)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "arm", "y", "x")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.cuped(df, Seq("g"), "arm", "y", "x")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))
        .toSet
      val want = rows
        .filter(r => r._2 != null && r._3 != null && r._4 != null)
        .groupBy(_._1).map { case (g, rs) =>
          def q(v: Double) = BigInt(math.floor(v * 10000).toLong)
          val all = rs.map(r => (r._2.booleanValue,
            q(r._3.doubleValue), q(r._4.doubleValue)))
          val nA = all.count(_._1).toLong
          val nB = all.size - nA
          val sx = all.map(_._3).sum; val sy = all.map(_._2).sum
          val sxx = all.map(r => r._3 * r._3).sum
          val sxy = all.map(r => r._3 * r._2).sum
          val syy = all.map(r => r._2 * r._2).sum
          val sxa = all.filter(_._1).map(_._3).sum
          val sxb = all.filterNot(_._1).map(_._3).sum
          val sya = all.filter(_._1).map(_._2).sum
          val syb = all.filterNot(_._1).map(_._2).sum
          val n = BigInt(all.size)
          val covNum = n * sxy - sx * sy
          val varXNum = n * sxx - sx * sx
          val varYNum = n * syy - sy * sy
          val theta = covNum.toDouble / varXNum.toDouble
          val dY = sya.toDouble / nA.toDouble - syb.toDouble / nB.toDouble
          val dX = sxa.toDouble / nA.toDouble - sxb.toDouble / nB.toDouble
          val rho2 = covNum.toDouble * covNum.toDouble /
            (varXNum.toDouble * varYNum.toDouble)
          val arms = nA > 0 && nB > 0
          val tOk = varXNum > 0
          (g, nA, nB,
            if (arms) Some(math.floor(dY * 100.0).toLong) else None,
            if (tOk) Some(math.floor(theta * 1000000.0).toLong) else None,
            if (arms && tOk)
              Some(math.floor((dY - theta * dX) * 100.0).toLong) else None,
            if (tOk && varYNum > 0)
              Some(math.floor(rho2 * 1000000.0).toLong) else None)
        }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: mantelHaenszel matches a local per-stratum cleared fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(16100 + trial)
      val rows = (0 until 2 + rnd.nextInt(2)).flatMap { g =>
        (0 until 3 + rnd.nextInt(4)).flatMap { s =>
          (0 until 1 + rnd.nextInt(15)).map { _ =>
            val arm: java.lang.Boolean =
              if (rnd.nextInt(12) == 0) null else rnd.nextBoolean()
            val out: java.lang.Boolean =
              if (rnd.nextInt(12) == 0) null else rnd.nextInt(10) < 4
            (s"g$g", s"s$s", arm, out)
          }
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "st", "arm", "out")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.mantelHaenszel(df, Seq("g"), Seq("st"),
          "arm", "out")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.isNullAt(5)))
        .toSet
      val want = rows.filter(r => r._3 != null && r._4 != null)
        .groupBy(_._1).map { case (g, rs) =>
          val strata = rs.groupBy(_._2).values.map { ss =>
            val a = BigInt(ss.count(r => r._3.booleanValue && r._4.booleanValue))
            val b = BigInt(ss.count(r => r._3.booleanValue && !r._4.booleanValue))
            val c = BigInt(ss.count(r => !r._3.booleanValue && r._4.booleanValue))
            val d = BigInt(ss.count(r => !r._3.booleanValue && !r._4.booleanValue))
            val n = a + b + c + d
            val ad = (a * d * 1000000) / n
            val bc = (b * c * 1000000) / n
            val em = ((a + b) * (a + c) * 1000000) / n
            val vm = if (n > 1)
              ((a + b) * (c + d) * (a + c) * (b + d) * 1000000) /
                (n * n * (n - 1))
            else BigInt(0)
            (n, a, ad, bc, em, vm)
          }.toVector
          val n = strata.map(_._1).sum
          val o = strata.map(_._2).sum
          val r = strata.map(_._3).sum
          val s = strata.map(_._4).sum
          val e = strata.map(_._5).sum
          val v = strata.map(_._6).sum
          val orM = if (s > 0) Some(((r * 1000000) / s).toLong) else None
          val z = if (v > 0)
            Some(math.floor((o * 1000000 - e).toDouble * 1000.0 /
              math.sqrt(v.toDouble)).toLong)
          else None
          (g, strata.size.toLong, n.toLong, orM, z, z.isEmpty)
        }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: olsTwoFeature matches a local Cramer fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(16200 + trial)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        val collinear = g == 0 // x2 = x1 -> det 0 -> NULLs
        (0 until 3 + rnd.nextInt(25)).map { _ =>
          val x1: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(401) - 200) / 16.0
          val x2: java.lang.Double =
            if (x1 == null) null
            else if (collinear) x1 else (rnd.nextInt(401) - 200) / 16.0
          val y: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(401) - 200) / 16.0
          (s"g$g", x1, x2, y)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "x1", "x2", "y")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.olsTwoFeature(df, Seq("g"), "x1", "x2", "y")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          (2 to 5).map(i =>
            if (r.isNullAt(i)) None else Some(r.getLong(i))).toVector))
        .toSet
      val want = rows
        .filter(r => r._2 != null && r._3 != null && r._4 != null)
        .groupBy(_._1).map { case (g, rs) =>
          def q(v: Double) = BigInt(math.floor(v * 100).toLong)
          val vs = rs.map(r =>
            (q(r._2.doubleValue), q(r._3.doubleValue), q(r._4.doubleValue)))
          val n = BigInt(vs.size)
          val s1 = vs.map(_._1).sum; val s2 = vs.map(_._2).sum
          val sy = vs.map(_._3).sum
          val s11 = vs.map(v => v._1 * v._1).sum
          val s22 = vs.map(v => v._2 * v._2).sum
          val s12 = vs.map(v => v._1 * v._2).sum
          val s1y = vs.map(v => v._1 * v._3).sum
          val s2y = vs.map(v => v._2 * v._3).sum
          val syy = vs.map(v => v._3 * v._3).sum
          val d11 = n * s11 - s1 * s1; val d22 = n * s22 - s2 * s2
          val d12 = n * s12 - s1 * s2
          val d1y = n * s1y - s1 * sy; val d2y = n * s2y - s2 * sy
          val dyy = n * syy - sy * sy
          val det = d11 * d22 - d12 * d12
          val vals = if (det > 0 && dyy > 0) {
            val b1 = (d1y.toDouble * d22.toDouble -
              d2y.toDouble * d12.toDouble) / det.toDouble
            val b2 = (d2y.toDouble * d11.toDouble -
              d1y.toDouble * d12.toDouble) / det.toDouble
            val b0q = (sy.toDouble - b1 * s1.toDouble - b2 * s2.toDouble) /
              vs.size.toDouble
            val r2 = (b1 * d1y.toDouble + b2 * d2y.toDouble) / dyy.toDouble
            Vector(Some(math.floor(b0q / 100L * 1000000.0).toLong),
              Some(math.floor(b1 * 1000000.0).toLong),
              Some(math.floor(b2 * 1000000.0).toLong),
              Some(math.floor(r2 * 1000000.0).toLong))
          } else Vector(None, None, None, None)
          (g, vs.size.toLong, vals)
        }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(2)} / ${(want diff got).take(2)}")
    }
  }

  test("fuzz: liftDeciles matches a local ntile/cumulative fold") {
    def ntileOf(pos: Int, n: Int, tiles: Int): Long = {
      val q = n / tiles; val r = n % tiles
      var acc = 0
      (1 to tiles).foreach { t =>
        acc += (if (t <= r) q + 1 else q)
        if (pos < acc) return t.toLong
      }
      tiles.toLong
    }
    for (trial <- 0 until 4) {
      val rnd = new Random(16300 + trial)
      val nTiles = 2 + rnd.nextInt(8)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        (0 until 1 + rnd.nextInt(30)).map { i =>
          (s"g$g", s"d$g-$i", rnd.nextInt(9) / 8.0, rnd.nextInt(10) < 3)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "id", "score", "conv")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.liftDeciles(df, Seq("g"), "id", "score", "conv",
          nTiles)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val n = rs.size
        val tiled = rs.map(r => (r._2, math.floor(r._3 * 10000).toLong,
            if (r._4) 1L else 0L))
          .sortBy { case (id, s, _) => (-s, id) }
          .zipWithIndex.map { case ((_, _, c), i) => (ntileOf(i, n, nTiles), c) }
        val cells = tiled.groupBy(_._1).view.mapValues(cs =>
          (cs.size.toLong, cs.map(_._2).sum)).toMap
        val tn = n.toLong
        val tc = tiled.map(_._2).sum
        val tiles = cells.keys.toVector.sorted
        val cums = tiles.scanLeft((0L, 0L)) { case ((cn, cc), t) =>
          (cn + cells(t)._1, cc + cells(t)._2) }.tail
        tiles.zip(cums).map { case (t, (cn, cc)) =>
          val (nn, conv) = cells(t)
          (g, t, nn, conv, conv * 1000000L / nn,
            if (tc > 0) Some(cc * tn * 1000000L / (cn * tc)) else None)
        }
      }.toSet
      assert(got == want, s"trial $trial (tiles=$nTiles): " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }
}
