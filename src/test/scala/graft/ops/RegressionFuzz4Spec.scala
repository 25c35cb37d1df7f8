package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the classifier-evaluation relations
  * against independent local folds: per-class confusion stats over the
  * union of actual and predicted label sets, the calibration report's
  * per-bin means and group ECE, the binned precision–recall curve's
  * suffix sums, and the precision-targeted operating-point election
  * (lowest qualifying threshold). Seeds are pinned so every trial
  * reproduces.
  */
class RegressionFuzz4Spec extends SparkSpec {
  import spark.implicits._

  test("fuzz: confusionStats matches a local per-class fold") {
    val cats = IndexedSeq("x", "y", "z", "w")
    for (trial <- 0 until 4) {
      val rnd = new Random(15300 + trial)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        (0 until 2 + rnd.nextInt(25)).map { _ =>
          val a: String = if (rnd.nextInt(12) == 0) null
            else cats(rnd.nextInt(3)) // "w" never actual
          val p: String = if (rnd.nextInt(12) == 0) null
            else cats(1 + rnd.nextInt(3)) // "x" never predicted
          (s"g$g", a, p)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "a", "p")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.confusionStats(df, Seq("g"), "a", "p")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6)),
          if (r.isNullAt(7)) None else Some(r.getLong(7))))
        .toSet
      val want = rows.filter(r => r._2 != null && r._3 != null)
        .groupBy(_._1).flatMap { case (g, rs) =>
          val labels = (rs.map(_._2) ++ rs.map(_._3)).distinct
          labels.map { l =>
            val na = rs.count(_._2 == l).toLong
            val np = rs.count(_._3 == l).toLong
            val tp = rs.count(r => r._2 == l && r._3 == l).toLong
            (g, l, na, np, tp,
              if (np > 0) Some(tp * 1000000L / np) else None,
              if (na > 0) Some(tp * 1000000L / na) else None,
              if (np + na > 0) Some(2 * tp * 1000000L / (np + na)) else None)
          }
        }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: calibrationReport matches a local bin/ECE fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(15400 + trial)
      val nBins = 2 + rnd.nextInt(6)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        (0 until 1 + rnd.nextInt(30)).map { _ =>
          val s: java.lang.Double =
            if (rnd.nextInt(12) == 0) null else rnd.nextInt(17) / 16.0
          val y: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null else rnd.nextBoolean()
          (s"g$g", s, y)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "score", "label")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.calibrationReport(df, Seq("g"), "score", "label",
          nBins)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .toSet
      val valid = rows.filter(r => r._2 != null && r._3 != null).map { r =>
        val bin = math.min(math.max(
          math.floor(r._2.doubleValue * nBins), 0.0),
          (nBins - 1).toDouble).toLong
        (r._1, bin, math.floor(r._2.doubleValue * 1000000).toLong,
          if (r._3.booleanValue) 1L else 0L)
      }
      val want = valid.groupBy(_._1).flatMap { case (g, rs) =>
        val cells = rs.groupBy(_._2).view.mapValues { cs =>
          val n = cs.size.toLong
          (n, cs.map(c => BigInt(c._3)).sum / n,
            cs.map(_._4).sum * 1000000L / n)
        }.toMap
        val gapSum = cells.values.map { case (n, conf, acc) =>
          BigInt((acc - conf.toLong).abs) * n }.sum
        val nTot = rs.size.toLong
        val ece = (gapSum / nTot).toLong
        cells.map { case (b, (n, conf, acc)) =>
          (g, b, n, conf.toLong, acc, ece) }
      }.toSet
      assert(got == want, s"trial $trial (B=$nBins): " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: prCurve and operatingPoint match local suffix-sum folds") {
    for (trial <- 0 until 4) {
      val rnd = new Random(15500 + trial)
      val nBins = 2 + rnd.nextInt(6)
      val target = Seq(600000L, 800000L, 900000L)(rnd.nextInt(3))
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        (0 until 1 + rnd.nextInt(30)).map { _ =>
          val s: java.lang.Double =
            if (rnd.nextInt(12) == 0) null else rnd.nextInt(17) / 16.0
          val y: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null else rnd.nextInt(10) < 4
          (s"g$g", s, y)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "score", "label")
        .repartition(1 + rnd.nextInt(4))
      val valid = rows.filter(r => r._2 != null && r._3 != null)
        .map(r => (r._1, r._2.doubleValue,
          if (r._3.booleanValue) 1L else 0L))

      val gotP = Regression.prCurve(df, Seq("g"), "label", "score", nBins)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getLong(6)),
          if (r.isNullAt(7)) None else Some(r.getLong(7))))
        .toSet
      val wantP = valid.groupBy(_._1).flatMap { case (g, rs) =>
        val binned = rs.map { case (_, s, y) =>
          (math.min(math.max(math.floor(s * nBins), 0.0),
            (nBins - 1).toDouble).toLong, y)
        }
        val cells = binned.groupBy(_._1).view.mapValues(cs =>
          (cs.size.toLong, cs.map(_._2).sum)).toMap
        val totPos = binned.map(_._2).sum
        cells.keys.map { t =>
          val sfx = cells.filter(_._1 >= t).values
          val tp = sfx.map(_._2).sum
          val fp = sfx.map(c => c._1 - c._2).sum
          val fn = totPos - tp
          (g, t, tp, fp, fn, tp * 1000000L / (tp + fp),
            if (tp + fn > 0) Some(tp * 1000000L / (tp + fn)) else None,
            if (2 * tp + fp + fn > 0)
              Some(2 * tp * 1000000L / (2 * tp + fp + fn)) else None)
        }
      }.toSet
      assert(gotP == wantP, s"trial $trial pr (B=$nBins)")

      val gotO = Regression.operatingPoint(df, Seq("g"), "label", "score",
          target)
        .collect()
        .map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))
        .toSet
      val wantO = valid.groupBy(_._1).map { case (g, rs) =>
        val cells = rs.map { case (_, s, y) =>
          (math.floor(s * 10000).toLong, y) }
          .groupBy(_._1).view.mapValues(cs =>
            (cs.size.toLong, cs.map(_._2).sum)).toMap
        val totPos = cells.values.map(_._2).sum
        val qualifying = cells.keys.toVector.sorted.flatMap { t =>
          val sfx = cells.filter(_._1 >= t).values
          val ctp = sfx.map(_._2).sum
          val cn = sfx.map(_._1).sum
          val prec = ctp * 1000000L / cn
          if (prec >= target && totPos > 0)
            Some((t, ctp, cn - ctp, prec,
              if (totPos > 0) Some(ctp * 1000000L / totPos) else None))
          else None
        }
        qualifying.headOption match {
          case Some((t, tp, fp, prec, rec)) =>
            (g, Some(t), Some(tp), Some(fp), Some(prec), rec)
          case None => (g, None, None, None, None, None)
        }
      }.toSet
      assert(gotO == wantO, s"trial $trial op (target=$target)")
    }
  }
}
