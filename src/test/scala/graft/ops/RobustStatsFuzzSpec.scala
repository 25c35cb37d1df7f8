package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the robust-stats family against
  * independent local folds. Value domains are DYADIC grids (quarters /
  * eighths) and percentile fractions are dyadic, so every interpolated
  * quantile, 4-dp round, and fence product is an EXACT IEEE double —
  * the local fold cannot drift from the plan by an ulp, and any mismatch
  * is a real semantics bug (tie handling, fence inclusivity, truncating
  * vs flooring division, null handling). Inputs are shuffled and randomly
  * repartitioned; seeds are pinned so every trial reproduces.
  */
class RobustStatsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def roundLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's exact-percentile interpolation over a sorted vector. */
  private def pctile(sorted: Vector[Double], p: Double): Double = {
    val pos = p * (sorted.size - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }

  test("fuzz: madOutliers matches a local quantized median/MAD screen") {
    for (trial <- 0 until 4) {
      val rnd = new Random(8300 + trial)
      val k = Seq(1.5, 2.0, 3.0)(rnd.nextInt(3))
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { g =>
        val n = 1 + rnd.nextInt(25)
        // quarter grid, a few repeated spikes for zero-MAD groups
        val spike = (rnd.nextInt(41) - 20) * 0.25
        (0 until n).map { _ =>
          val v = if (rnd.nextInt(3) == 0) spike
            else (rnd.nextInt(41) - 20) * 0.25
          (s"g$g", v)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "v")
        .repartition(1 + rnd.nextInt(5))
      val got = RobustStats.madOutliers(df, Seq("g"), "v", k)
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val byG = rows.groupBy(_._1)
      val want = rows.map { case (g, v) =>
        val vs = byG(g).map(_._2).sorted.toVector
        val med = round4(pctile(vs, 0.5))
        val mad = round4(pctile(vs.map(x => math.abs(x - med)).sorted, 0.5))
        (g, v, math.abs(v - med) > k * mad)
      }.groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want, s"trial $trial (k=$k)")
    }
  }

  test("fuzz: trimmedStats matches a local fence/trim/winsor fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(8400 + trial)
      val dyadic = Seq(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875)
      val lo = dyadic(rnd.nextInt(3))           // <= 0.375
      val hi = dyadic(3 + rnd.nextInt(4))       // >= 0.5
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { g =>
        val n = 1 + rnd.nextInt(25)
        (0 until n).map { _ =>
          val v: java.lang.Double =
            if (rnd.nextInt(10) == 0) null
            else (rnd.nextInt(801) - 400) * 0.25
          (s"g$g", v)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "v")
        .repartition(1 + rnd.nextInt(5))
      val got = RobustStats.trimmedStats(df, Seq("g"), "v", lo, hi)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
        .toSet
      val want = rows.filter(_._2 != null).groupBy(_._1).map { case (g, rs) =>
        val vs = rs.map(_._2.doubleValue)
        val sorted = vs.sorted.toVector
        val lo4 = roundLong(pctile(sorted, lo) * 10000)
        val hi4 = roundLong(pctile(sorted, hi) * 10000)
        val v4s = vs.map(v => roundLong(v * 10000))
        val kept = v4s.filter(v => v >= lo4 && v <= hi4)
        val wsum = v4s.map(v => math.min(math.max(v, lo4), hi4))
          .map(BigInt(_)).sum
        val trimmed =
          if (kept.nonEmpty)
            Some((kept.map(BigInt(_)).sum * 100 / kept.size).toLong)
          else None
        (g, vs.size.toLong, kept.size.toLong, trimmed,
          (wsum * 100 / vs.size).toLong)
      }.toSet
      assert(got == want, s"trial $trial (lo=$lo hi=$hi): " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: shrunkMeans matches a local cross-multiplied rational fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(8500 + trial)
      val kPrior = rnd.nextInt(30) // 0 degenerates to the raw mean
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { g =>
        (0 until 1 + rnd.nextInt(20)).map { _ =>
          val v: java.lang.Double =
            if (rnd.nextInt(10) == 0) null
            else (rnd.nextInt(801) - 400) * 0.25 // signed: truncating div
          (s"g$g", v)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "v")
        .repartition(1 + rnd.nextInt(5))
      val got = RobustStats.shrunkMeans(df, Seq("g"), "v", kPrior)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val valid = rows.filter(_._2 != null)
        .map { case (g, v) => (g, BigInt(roundLong(v.doubleValue * 10000))) }
      val gn = BigInt(valid.size)
      val gs = valid.map(_._2).sum
      val want = valid.groupBy(_._1).map { case (g, rs) =>
        val n = BigInt(rs.size)
        val s = rs.map(_._2).sum
        (g, rs.size.toLong, ((s * 100) / n).toLong,
          (((s * gn + kPrior * gs) * 100) / (gn * (n + kPrior))).toLong)
      }.toSet
      assert(got == want, s"trial $trial (k=$kPrior)")
    }
  }

  test("fuzz: mergeableStats matches a local exact cents fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(8600 + trial)
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { g =>
        (0 until 1 + rnd.nextInt(25)).map { _ =>
          val v: java.lang.Double =
            if (rnd.nextInt(10) == 0) null
            else (rnd.nextInt(20001) - 10000) / 16.0 // dyadic, signed
          (s"g$g", s"s${rnd.nextInt(4)}", v)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "shard", "v")
        .repartition(1 + rnd.nextInt(5))
      val got = RobustStats.mergeableStats(df, Seq("g"), "shard", "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
        .toSet
      val want = rows.filter(_._3 != null).groupBy(_._1).map { case (g, rs) =>
        val cents = rs.map(r =>
          (r._2, BigInt(math.floor(r._3.doubleValue * 100).toLong)))
        val n = BigInt(cents.size)
        val s = cents.map(_._2).sum
        val ss = cents.map(c => c._2 * c._2).sum
        (g, cents.map(_._1).distinct.size.toLong, cents.size.toLong,
          s.toLong, (s / n).toLong, ((n * ss - s * s) / (n * n)).toLong,
          cents.map(_._2).min.toLong, cents.map(_._2).max.toLong)
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("fuzz: giniCoefficient and concentrationIndex match local " +
    "order-statistic folds") {
    for (trial <- 0 until 4) {
      val rnd = new Random(8700 + trial)
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { g =>
        val zeroGroup = g == 0 // sum 0 -> NULL scores
        (0 until 1 + rnd.nextInt(25)).map { _ =>
          val v: java.lang.Long =
            if (rnd.nextInt(10) == 0) null
            else if (zeroGroup) 0L
            else rnd.nextInt(50).toLong // tie-heavy, zeros included
          (s"g$g", v)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "v")
        .repartition(1 + rnd.nextInt(5))
      val valid = rows.filter(_._2 != null)
        .map { case (g, v) => (g, v.longValue) }

      val gotG = RobustStats.giniCoefficient(df, Seq("g"), "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      val wantG = valid.groupBy(_._1).map { case (g, rs) =>
        val xs = rs.map(_._2).sorted
        val n = BigInt(xs.size)
        val s = xs.map(BigInt(_)).sum
        val w = xs.zipWithIndex.map { case (x, i) =>
          BigInt(2 * (i + 1) - 1) * x }.sum
        val gini = if (s > 0) Some((((w - n * s) * 1000000) / (n * s)).toLong)
          else None
        (g, xs.size.toLong, s.toLong, gini)
      }.toSet
      assert(gotG == wantG, s"trial $trial gini")

      val gotC = RobustStats.concentrationIndex(df, Seq("g"), "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toSet
      val wantC = valid.groupBy(_._1).map { case (g, rs) =>
        val xs = rs.map(r => BigInt(r._2))
        val s = xs.sum
        val hhi = if (s > 0)
          Some(((xs.map(x => x * x).sum * 1000000) / (s * s)).toLong) else None
        val top = if (s > 0) Some(((xs.max * 1000000) / s).toLong) else None
        (g, xs.size.toLong, s.toLong, hhi, top)
      }.toSet
      assert(gotC == wantC, s"trial $trial hhi")
    }
  }
}
