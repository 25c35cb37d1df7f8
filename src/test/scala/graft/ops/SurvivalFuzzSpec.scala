package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the survival family against independent
  * local folds: Kaplan–Meier product-limit curves on tie-heavy censored
  * feeds (tiny duration domain forces multi-event cells; null durations
  * and flags must drop; a forced all-event group exercises the
  * curve-killing events == at_risk step and its NULL propagation), and
  * the two-sample log-rank test's exact O/E/V/z arithmetic (hypergeometric
  * moments as BigInt floor divisions, z as the same IEEE multiply/divide/
  * floor chain the plan runs). Inputs are shuffled and randomly
  * repartitioned; seeds are pinned so every trial reproduces.
  */
class SurvivalFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def roundLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  test("fuzz: kaplanMeier matches a local product-limit fold with ties, " +
    "censoring, and curve kills") {
    for (trial <- 0 until 4) {
      val rnd = new Random(8100 + trial)
      val rows = (0 until 3 + rnd.nextInt(3)).flatMap { k =>
        val n = 4 + rnd.nextInt(30)
        val allEvents = k == 0 // forced kill group: last cell dies entirely
        (0 until n).map { _ =>
          val dur: java.lang.Long =
            if (rnd.nextInt(10) == 0) null else rnd.nextInt(6).toLong
          val ev: java.lang.Boolean =
            if (rnd.nextInt(10) == 0) null
            else if (allEvents) true else rnd.nextInt(10) < 6
          (s"g$k", dur, ev)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "dur", "ev")
        .repartition(1 + rnd.nextInt(5))
      val got = Survival.kaplanMeier(df, Seq("g"), "dur", "ev")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
        .toSet
      val valid = rows.filter(r => r._2 != null && r._3 != null)
      val want = valid.groupBy(_._1).flatMap { case (g, rs) =>
        val cells = rs.groupBy(_._2.longValue).toVector.sortBy(_._1)
          .map { case (t, cs) =>
            (t, cs.size.toLong, cs.count(_._3.booleanValue).toLong)
          }
        // at_risk = suffix sum of cell sizes (subjects with duration >= t)
        val atRisk = cells.scanRight(0L)((c, acc) => acc + c._2).init
        var run = 0L
        var dead = false
        cells.zip(atRisk).map { case ((t, n, d), r) =>
          if (d == r) dead = true // prefix max includes the current row
          if (!dead && d > 0L)
            run += roundLong(math.log((r - d).toDouble / r.toDouble) * 1e6)
          (g, t, r, d, n - d, if (dead) None else Some(run))
        }
      }.toSet
      assert(got == want,
        s"trial $trial: diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: logRank matches a local hypergeometric O/E/V fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(8200 + trial)
      val rows = (0 until 3 + rnd.nextInt(3)).flatMap { k =>
        val n = 4 + rnd.nextInt(30)
        val armP = if (k == 0) 10 else 2 + rnd.nextInt(7) // k=0: one arm only
        (0 until n).map { _ =>
          val dur: java.lang.Long =
            if (rnd.nextInt(12) == 0) null else rnd.nextInt(6).toLong
          val ev: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null else rnd.nextInt(10) < 6
          val arm: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null else rnd.nextInt(10) < armP
          (s"g$k", arm, dur, ev)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "arm", "dur", "ev")
        .repartition(1 + rnd.nextInt(5))
      val got = Survival.logRank(df, Seq("g"), "arm", "dur", "ev")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
          r.isNullAt(6)))
        .toSet
      val valid = rows.filter(r => r._2 != null && r._3 != null && r._4 != null)
      val want = valid.groupBy(_._1).flatMap { case (g, rs) =>
        val cells = rs.groupBy(_._3.longValue).toVector.sortBy(_._1)
          .map { case (t, cs) =>
            (t, cs.size.toLong, cs.count(_._2.booleanValue).toLong,
              cs.count(_._4.booleanValue).toLong,
              cs.count(c => c._2.booleanValue && c._4.booleanValue).toLong)
          }
        val r = cells.scanRight(0L)((c, acc) => acc + c._2).init
        val ra = cells.scanRight(0L)((c, acc) => acc + c._3).init
        val terms = cells.zip(r.zip(ra)).collect {
          case ((_, _, _, d, da), (ri, rai)) if d > 0L =>
            val em = BigInt(d) * rai * 1000000 / ri
            val vm = if (ri > 1L)
              BigInt(d) * rai * (ri - rai) * (ri - d) * 1000000 /
                (BigInt(ri) * ri * (ri - 1))
            else BigInt(0)
            (da, em, vm)
        }
        if (terms.isEmpty) None
        else {
          val oa = terms.map(_._1).sum
          val e = terms.map(_._2).sum
          val v = terms.map(_._3).sum
          val z = if (v > 0)
            Some(math.floor((BigInt(oa) * 1000000 - e).toDouble * 1000.0 /
              math.sqrt(v.toDouble)).toLong)
          else None
          // p_micro is Regression's rational normal CDF — not re-derived
          // here; the differential pins its NULL contract to z's
          Some((g, terms.size.toLong, oa, e.toLong, v.toLong, z, z.isEmpty))
        }
      }.toSet
      assert(got == want,
        s"trial $trial: diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }
}
