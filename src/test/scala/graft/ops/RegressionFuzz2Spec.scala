package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the evaluation/test-statistic operators
  * against independent local folds: rank-based ROC AUC under heavy
  * score ties (the doubled-midrank U statistic), Benjamini–Hochberg
  * step-up adjustment (reverse running min, null-p passthrough),
  * Cohen's kappa from raw rating pairs, the chi-square grid with its
  * pinned cumulative summation order, and Mann–Kendall's
  * tie-corrected variance and continuity-corrected z. Seeds are pinned
  * so every trial reproduces.
  */
class RegressionFuzz2Spec extends SparkSpec {
  import spark.implicits._

  test("fuzz: rocAuc matches a local doubled-midrank U fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(14500 + trial)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        val posOnly = g == 0 // one-class group -> NULL auc
        (0 until 1 + rnd.nextInt(25)).map { _ =>
          val lbl: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null
            else if (posOnly) true else rnd.nextBoolean()
          val sc: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else rnd.nextInt(9) / 8.0 // tie-heavy dyadic scores
          (s"g$g", lbl, sc)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "label", "score")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.rocAuc(df, Seq("g"), "label", "score")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toSet
      val valid = rows.filter(r => r._2 != null && r._3 != null)
        .map(r => (r._1, r._2.booleanValue,
          math.floor(r._3.doubleValue * 10000).toLong))
      val want = valid.groupBy(_._1).map { case (g, rs) =>
        val scores = rs.map(_._3)
        def r2(s: Long): Long = {
          val rank = 1L + scores.count(_ < s)
          val tie = scores.count(_ == s).toLong
          2 * rank + tie - 1
        }
        val nPos = rs.count(_._2).toLong
        val nNeg = rs.size - nPos
        val rp2 = rs.filter(_._2).map(r => BigInt(r2(r._3))).sum
        val u2 = rp2 - BigInt(nPos) * (nPos + 1)
        val auc = if (nPos > 0 && nNeg > 0)
          Some(((u2 * 1000000) / (BigInt(2) * nPos * nNeg)).toLong)
        else None
        (g, nPos, nNeg, u2.toLong, auc)
      }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: bhAdjust matches a local step-up fold with null p-values") {
    for (trial <- 0 until 4) {
      val rnd = new Random(14600 + trial)
      val rows = (0 until 3 + rnd.nextInt(25)).map { i =>
        val p: java.lang.Long =
          if (rnd.nextInt(6) == 0) null
          else (rnd.nextInt(21) * 50000).toLong // tie-heavy micro p
        (s"t$i", p)
      }
      val df = rnd.shuffle(rows).toDF("tid", "p")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.bhAdjust(df, "p", Seq("tid"))
        .collect()
        .map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      val nonNull = rows.filter(_._2 != null)
        .sortBy(r => (r._2.longValue, r._1))
      val m = nonNull.size.toLong
      val raws = nonNull.zipWithIndex.map { case ((_, p), i) =>
        p.longValue * m / (i + 1) }
      val adjs = raws.scanRight(Long.MaxValue)(math.min).init
        .map(a => math.min(a, 1000000L))
      val adjMap = nonNull.zipWithIndex.map { case ((id, _), i) =>
        id -> ((i + 1).toLong, adjs(i)) }.toMap
      val want = rows.map { case (id, p) =>
        adjMap.get(id) match {
          case Some((rank, adj)) =>
            (id, Some(p.longValue), Some(adj), Some(rank))
          case None => (id, Option(p).map(_.longValue), None, None)
        }
      }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: cohenKappa and chiSquare match local contingency folds") {
    for (trial <- 0 until 4) {
      val rnd = new Random(14700 + trial)
      val cats = IndexedSeq("x", "y", "z")
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        (0 until 2 + rnd.nextInt(25)).map { _ =>
          val a: String = if (rnd.nextInt(12) == 0) null
            else cats(rnd.nextInt(cats.size))
          val b: String = if (rnd.nextInt(12) == 0) null
            else cats(rnd.nextInt(if (rnd.nextInt(3) == 0) cats.size else 2))
          (s"g$g", a, b)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "a", "b")
        .repartition(1 + rnd.nextInt(4))
      val valid = rows.filter(r => r._2 != null && r._3 != null)

      val gotK = Regression.cohenKappa(df, Seq("g"), "a", "b")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      val wantK = valid.groupBy(_._1).map { case (g, rs) =>
        val n = BigInt(rs.size)
        val agree = BigInt(rs.count(r => r._2 == r._3))
        val cas = rs.map(_._2).groupBy(identity).view.mapValues(v => BigInt(v.size))
        val cbs = rs.map(_._3).groupBy(identity).view.mapValues(v => BigInt(v.size))
        val e = (cas.keySet ++ cbs.keySet).map(c =>
          cas.getOrElse(c, BigInt(0)) * cbs.getOrElse(c, BigInt(0))).sum
        val num = agree * n - e
        val den = n * n - e
        val kappa = if (den != 0)
          Some(math.floor(num.toDouble / den.toDouble * 1000000.0).toLong)
        else None
        (g, rs.size.toLong, agree.toLong, kappa)
      }.toSet
      assert(gotK == wantK, s"trial $trial kappa")

      val gotC = Regression.chiSquare(df, Seq("g"), "a", "b")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val wantC = valid.groupBy(_._1).map { case (g, rs) =>
        val as = rs.map(_._2).distinct.sorted
        val bs = rs.map(_._3).distinct.sorted
        val obs = rs.groupBy(r => (r._2, r._3)).view.mapValues(_.size.toLong)
        val n = rs.size.toLong
        val rowT = as.map(a => a -> rs.count(_._2 == a).toLong).toMap
        val colT = bs.map(b => b -> rs.count(_._3 == b).toLong).toMap
        // cumulative in (a, b) order — the plan's pinned summation order
        val chi = (for (a <- as; b <- bs) yield {
          val e = rowT(a).toDouble * colT(b).toDouble / n.toDouble
          val d = obs.getOrElse((a, b), 0L).toDouble - e
          d * d / e
        }).foldLeft(0.0)(_ + _)
        (g, math.floor(chi * 1000000.0).toLong,
          ((as.size - 1) * (bs.size - 1)).toLong)
      }.toSet
      assert(gotC == wantC, s"trial $trial chi2")
    }
  }

  test("fuzz: mannKendall matches a local tie-corrected S/var fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(14800 + trial)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        (0 until 2 + rnd.nextInt(20)).map { _ =>
          (s"g$g", rnd.nextInt(12).toLong, // tie-heavy times
            rnd.nextInt(8).toLong)         // tie-heavy values
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "t", "x")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.mannKendall(df, Seq("g"), "t", "x")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getString(6)))
      // split: exact fields vs p/trend (p uses the rational normal CDF —
      // not re-derived; its NULL contract and the trend rule are pinned)
      val gotCore = got.map(r => (r._1, r._2, r._3, r._4, r._5)).toSet
      val wantCore = rows.groupBy(_._1).map { case (g, rs) =>
        val s = (for {
          i <- rs.indices; j <- rs.indices
          if rs(i)._2 < rs(j)._2
        } yield math.signum(rs(j)._3 - rs(i)._3)).sum
        val n = rs.size.toLong
        val tsum = rs.groupBy(_._3).values.map { vs =>
          val tc = vs.size.toLong
          tc * (tc - 1) * (2 * tc + 5)
        }.sum
        val var18 = n * (n - 1) * (2 * n + 5) - tsum
        val sAdj = if (s > 0) s - 1 else if (s < 0) s + 1 else 0L
        val z = if (var18 > 0)
          Some(math.floor(sAdj.toDouble * 1000000.0 /
            math.sqrt(var18.toDouble / 18.0)).toLong)
        else None
        (g, n, s, var18, z)
      }.toSet
      assert(gotCore == wantCore, s"trial $trial core: " +
        s"diff=${(gotCore diff wantCore).take(3)}")
      got.foreach { case (g, _, s, _, z, p, trend) =>
        assert(p.isDefined == z.isDefined, s"trial $trial p-null $g")
        val wantTrend =
          if (p.exists(_ <= 50000L) && s > 0) "increasing"
          else if (p.exists(_ <= 50000L) && s < 0) "decreasing"
          else "no trend"
        assert(trend == wantTrend, s"trial $trial trend $g")
      }
    }
  }
}
