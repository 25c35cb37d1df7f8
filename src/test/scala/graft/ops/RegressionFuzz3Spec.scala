package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the experiment/eval readout operators
  * against independent local folds: linearTrend's cleared-denominator
  * OLS (truncating divisions on signed numerators), Welch's t with the
  * exact fixed IEEE expression tree over quantized sums, Fleiss' kappa
  * with the complete-item filter, and rankingMetrics' micro-nat DCG,
  * MRR, and AP under shuffled rank permutations. Seeds are pinned so
  * every trial reproduces.
  */
class RegressionFuzz3Spec extends SparkSpec {
  import spark.implicits._

  private def roundLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  test("fuzz: linearTrend matches a local cleared-denominator OLS fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(14900 + trial)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        val constX = g == 0 // zero denominator -> NULL slope
        (0 until 1 + rnd.nextInt(20)).map { _ =>
          val x: java.lang.Long =
            if (rnd.nextInt(12) == 0) null
            else if (constX) 3L else rnd.nextInt(20).toLong
          val y: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(3201) - 1600) / 16.0
          (s"g$g", x, y)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "x", "y")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.linearTrend(df, Seq("g"), "x", "y")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
        .toSet
      val want = rows.filter(r => r._2 != null && r._3 != null)
        .groupBy(_._1).map { case (g, rs) =>
          val xs = rs.map(r => BigInt(r._2.longValue))
          val ys = rs.map(r => BigInt(roundLong(r._3.doubleValue * 10000)))
          val n = BigInt(rs.size)
          val sx = xs.sum; val sy = ys.sum
          val sxx = xs.map(x => x * x).sum
          val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
          val num = n * sxy - sx * sy
          val den = n * sxx - sx * sx
          val slope = if (den > 0) Some(((num * 100) / den).toLong) else None
          val icpt = if (den > 0)
            Some((((sy * den - num * sx) * 100) / (n * den)).toLong) else None
          (g, rs.size.toLong, slope, icpt, ((sy * 100) / n).toLong)
        }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("fuzz: welchTTest matches the exact IEEE expression tree") {
    for (trial <- 0 until 4) {
      val rnd = new Random(15000 + trial)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        val tiny = g == 0 // an arm with n < 2 -> NULL t
        (0 until (if (tiny) 2 else 4) + rnd.nextInt(20)).map { i =>
          val arm: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null
            else if (tiny) i > 0 else rnd.nextBoolean()
          val y: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(3201) - 1600) / 16.0
          (s"g$g", arm, y)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "arm", "y")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.welchTTest(df, Seq("g"), "arm", "y")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))
        .toSet
      val want = rows.filter(r => r._2 != null && r._3 != null)
        .groupBy(_._1).map { case (g, rs) =>
          def side(a: Boolean) = rs.filter(_._2.booleanValue == a)
            .map(r => BigInt(math.floor(r._3.doubleValue * 10000).toLong))
          val (ya, yb) = (side(true), side(false))
          val (na, nb) = (ya.size.toLong, yb.size.toLong)
          val (sa, sb) = (ya.sum, yb.sum)
          val (ssa, ssb) = (ya.map(v => v * v).sum, yb.map(v => v * v).sum)
          val mA = sa.toDouble / na.toDouble
          val mB = sb.toDouble / nb.toDouble
          val vA = (ssa.toDouble - sa.toDouble * sa.toDouble / na.toDouble) /
            (na.toDouble - 1.0)
          val vB = (ssb.toDouble - sb.toDouble * sb.toDouble / nb.toDouble) /
            (nb.toDouble - 1.0)
          val seA = vA / na.toDouble; val seB = vB / nb.toDouble
          val se2 = seA + seB
          val tOk = na >= 2 && nb >= 2 && se2 > 0.0
          (g, na, nb,
            if (na > 0) Some(math.floor(mA * 100.0).toLong) else None,
            if (nb > 0) Some(math.floor(mB * 100.0).toLong) else None,
            if (tOk)
              Some(math.floor((mA - mB) / math.sqrt(se2) * 1000000.0).toLong)
            else None,
            if (tOk) Some(math.floor(se2 * se2 /
              (seA * seA / (na.toDouble - 1.0) +
                seB * seB / (nb.toDouble - 1.0)) * 1000000.0).toLong)
            else None)
        }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: fleissKappa matches a local complete-item fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(15100 + trial)
      val nRaters = 3 + rnd.nextInt(3)
      val cats = IndexedSeq("x", "y", "z")
      val rows = (0 until 2 + rnd.nextInt(2)).flatMap { g =>
        (0 until 3 + rnd.nextInt(10)).flatMap { i =>
          // most items complete; some short/overfull (must drop)
          val m = if (rnd.nextInt(4) == 0) 1 + rnd.nextInt(2 * nRaters)
            else nRaters
          (0 until m).map(_ => (s"g$g", s"i$g-$i",
            cats(rnd.nextInt(if (rnd.nextInt(3) == 0) 3 else 2))))
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "item", "cat")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.fleissKappa(df, Seq("g"), "item", "cat", nRaters)
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toSet
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val byItem = rs.groupBy(_._2).view
          .mapValues(_.groupBy(_._3).view.mapValues(_.size.toLong).toMap)
          .toMap
        val kept = byItem.filter(_._2.values.sum == nRaters.toLong)
        val nItems = BigInt(kept.size)
        val pnum = kept.values.map(cs =>
          cs.values.map(c => BigInt(c) * (c - 1)).sum).sum
        val catTot = kept.values.flatten
          .groupBy(_._1).view.mapValues(vs => vs.map(v => BigInt(v._2)).sum)
        val s = catTot.values.map(t => t * t).sum
        val r = BigInt(nRaters)
        val nn = nItems * r
        val dBar = nItems * r * (r - 1)
        val num = pnum * nn * nn - s * dBar
        val den = dBar * (nn * nn - s)
        val kappa = if (nItems > 0 && den != 0)
          Some(math.floor(num.toDouble / den.toDouble * 1000000.0).toLong)
        else None
        (g, kept.size.toLong, kappa)
      }.toSet
      assert(got == want, s"trial $trial (r=$nRaters): " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: rankingMetrics matches a local DCG/MRR/AP fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(15200 + trial)
      val k = 2 + rnd.nextInt(8)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        val n = 1 + rnd.nextInt(15)
        val ranks = rnd.shuffle((1 to n).toVector)
        ranks.map(r => (s"g$g", r.toLong,
          if (rnd.nextInt(3) == 0) rnd.nextInt(4).toLong else 0L))
      }
      val df = rnd.shuffle(rows).toDF("g", "rank", "rel")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.rankingMetrics(df, Seq("g"), "rank", "rel", k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
        .toSet
      def dterm(gain: Long, pos: Long): BigInt =
        (BigInt(gain) * 693147 * 1000000) /
          BigInt(roundLong(math.log((pos + 1).toDouble) * 1e6))
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val n = rs.size.toLong
        val nRel = rs.count(_._3 > 0).toLong
        val ideal = rs.sortBy(r => (-r._3, r._2)).zipWithIndex
          .map { case (r, i) => (r, (i + 1).toLong) }
        val dcg = rs.filter(r => r._2 <= k && r._3 > 0)
          .map(r => dterm((1L << r._3.toInt) - 1, r._2)).sum
        val idcg = ideal.filter { case (r, ir) => ir <= k && r._3 > 0 }
          .map { case (r, ir) => dterm((1L << r._3.toInt) - 1, ir) }.sum
        val first = rs.filter(r => r._3 > 0 && r._2 <= k).map(_._2)
          .minOption
        val apsum = rs.filter(r => r._3 > 0 && r._2 <= k).map { r =>
          val hits = rs.count(o => o._3 > 0 && o._2 <= r._2).toLong
          hits * 1000000L / r._2
        }.sum
        (g, n, nRel,
          first.map(1000000L / _).getOrElse(0L),
          if (idcg > 0) Some(((dcg * 1000000) / idcg).toLong) else None,
          if (nRel > 0) apsum / math.min(nRel, k.toLong) else 0L)
      }.toSet
      assert(got == want, s"trial $trial (k=$k): " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }
}
