package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the drift family against independent
  * local folds: KS on tie-heavy quantized two-arm feeds (cleared-
  * denominator cumulative gaps in BigInt, empty-arm NULL contract),
  * PSI/KL and JS over completed smoothed bin frames (exact integer
  * summands, the per-bin micro-nat ln as the only libm call), and the
  * Benford digit screen. Value grids are dyadic so `floor(v·10⁴)`,
  * `v / binWidth`, and every cleared product are exact IEEE doubles —
  * a mismatch is a semantics bug, not an ulp. Inputs are shuffled and
  * randomly repartitioned; seeds are pinned so every trial reproduces.
  */
class DriftFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def roundLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  test("fuzz: ksTest matches a local cleared-denominator CDF-gap fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(8800 + trial)
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { g =>
        val armP = if (g == 0) 10 else 3 + rnd.nextInt(5) // g0: one arm only
        (0 until 1 + rnd.nextInt(30)).map { _ =>
          val arm: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null else rnd.nextInt(10) < armP
          val v: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(81) - 40) * 0.25 // tie-heavy dyadic grid
          (s"g$g", arm, v)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "arm", "v")
        .repartition(1 + rnd.nextInt(5))
      val got = Drift.ksTest(df, Seq("g"), "arm", "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      val valid = rows.filter(r => r._2 != null && r._3 != null)
        .map(r => (r._1, r._2.booleanValue,
          math.floor(r._3.doubleValue * 10000).toLong))
      val want = valid.groupBy(_._1).map { case (g, rs) =>
        val cells = rs.groupBy(_._3).toVector.sortBy(_._1)
          .map { case (_, cs) =>
            (cs.count(_._2).toLong, cs.count(!_._2).toLong) }
        val nA = cells.map(_._1).sum
        val nB = cells.map(_._2).sum
        val gaps = cells.scanLeft((0L, 0L)) { case ((ca, cb), (a, b)) =>
          (ca + a, cb + b)
        }.tail.map { case (ca, cb) =>
          (BigInt(ca) * nB - BigInt(cb) * nA).abs }
        val ks = if (nA > 0 && nB > 0)
          Some(((gaps.max * 1000000) / (BigInt(nA) * nB)).toLong) else None
        (g, nA, nB, ks)
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("fuzz: driftReport and jsDivergence match local smoothed-bin folds") {
    for (trial <- 0 until 4) {
      val rnd = new Random(8900 + trial)
      val binWidth = Seq(0.25, 0.5, 1.0, 2.0)(rnd.nextInt(4))
      val nBins = 3 + rnd.nextInt(6)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        val expP = if (g == 0) 10 else 3 + rnd.nextInt(5) // g0: Q side empty
        (0 until 1 + rnd.nextInt(30)).map { _ =>
          val exp: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null else rnd.nextInt(10) < expP
          val v: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(81) - 20) * 0.25 // clamps both edges
          (s"g$g", exp, v)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "expected", "v")
        .repartition(1 + rnd.nextInt(5))
      val valid = rows.filter(r => r._2 != null && r._3 != null)
        .map { r =>
          val bin = math.min(math.max(
            math.floor(r._3.doubleValue / binWidth), 0.0),
            (nBins - 1).toDouble).toLong
          (r._1, r._2.booleanValue, bin)
        }
      val b = BigInt(nBins)
      val folds = valid.groupBy(_._1).map { case (g, rs) =>
        val np = BigInt(rs.count(_._2))
        val nq = BigInt(rs.size) - np
        val cells = (0L until nBins.toLong).map { bin =>
          val cp = BigInt(rs.count(r => r._2 && r._3 == bin))
          val cq = BigInt(rs.count(r => !r._2 && r._3 == bin))
          val wp = (cp + 1) * (nq + b)
          val wq = (cq + 1) * (np + b)
          (cp, wp, wq)
        }
        (g, np, nq, cells)
      }

      val gotDrift = Drift.driftReport(df, Seq("g"), "v", "expected",
          binWidth, nBins)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .toSet
      val wantDrift = folds.map { case (g, np, nq, cells) =>
        val s = cells.map { case (_, wp, wq) =>
          (wp - wq) * roundLong(
            math.log(wp.toDouble / wq.toDouble) * 1e6) }.sum
        val kl = cells.map { case (cp, wp, wq) =>
          (cp + 1) * roundLong(
            math.log(wp.toDouble / wq.toDouble) * 1e6) }.sum
        val d = ((np + b) * (nq + b)).toLong
        (g, np.toLong, nq.toLong,
          math.floor(s.toDouble / d.toDouble).toLong,
          math.floor(kl.toDouble / (np + b).toDouble).toLong)
      }.toSet
      assert(gotDrift == wantDrift, s"trial $trial (w=$binWidth B=$nBins)")

      val gotJs = Drift.jsDivergence(df, Seq("g"), "v", "expected",
          binWidth, nBins)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val wantJs = folds.map { case (g, np, nq, cells) =>
        val s = cells.map { case (_, wp, wq) =>
          val m = (wp + wq).toDouble
          wp * roundLong(math.log(2.0 * wp.toDouble / m) * 1e6) +
            wq * roundLong(math.log(2.0 * wq.toDouble / m) * 1e6) }.sum
        val d = ((np + b) * (nq + b) * 2).toLong
        (g, np.toLong, nq.toLong,
          math.floor(s.toDouble / d.toDouble).toLong)
      }.toSet
      assert(gotJs == wantJs, s"trial $trial js (w=$binWidth B=$nBins)")
    }
  }

  test("fuzz: benfordDigits matches a local first-digit fold") {
    val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    for (trial <- 0 until 4) {
      val rnd = new Random(9000 + trial)
      val allExcluded = trial == 0 // non-positive only -> 9 zero rows
      val rows = (0 until 1 + rnd.nextInt(60)).map { _ =>
        val v: java.lang.Double =
          if (rnd.nextInt(12) == 0) null
          else if (allExcluded) -(rnd.nextInt(40) * 0.25)
          else (rnd.nextInt(160001) - 40000) / 16.0
        Tuple1(v)
      }
      val df = rnd.shuffle(rows).toDF("v").repartition(1 + rnd.nextInt(5))
      val got = Drift.benfordDigits(df, "v")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .toSet
      val units = rows.flatMap(r => Option(r._1))
        .map(v => math.floor(v.doubleValue * 100).toLong)
        .filter(_ > 0L)
      val n = units.size.toLong
      val counts = units.groupBy(_.toString.head.asDigit)
        .view.mapValues(_.size.toLong).toMap
      val want = (1 to 9).map { d =>
        val cnt = counts.getOrElse(d, 0L)
        val share = if (n > 0) cnt * 1000000L / n else 0L
        (d, cnt, share, benford(d - 1), math.abs(share - benford(d - 1)))
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }
}
