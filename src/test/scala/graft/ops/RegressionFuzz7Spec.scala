package graft.ops

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differentials for the design/calibration operators against
  * independent local folds: subclassified ATE (ntile strata, size-
  * weighted signed truncating divisions), split-conformal calibration
  * (seeded md5 halves, ceil-division order-statistic threshold, the
  * +∞-quantile contract), minimum detectable effect, and an ACCURACY
  * differential for the rational normal p-value against Simpson
  * integration of the normal density (the A&S 26.2.19 error bound is
  * 1.5e-7 — below one micro, so got and reference may differ by at
  * most one floor step). Seeds are pinned so every trial reproduces.
  */
class RegressionFuzz7Spec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("fuzz: subclassifiedAte matches a local strata fold") {
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
      val rnd = new Random(16400 + trial)
      val nStrata = 2 + rnd.nextInt(5)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        (0 until 3 + rnd.nextInt(30)).map { i =>
          val arm: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null else rnd.nextBoolean()
          val x: java.lang.Long =
            if (rnd.nextInt(12) == 0) null else rnd.nextInt(10).toLong
          val y: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(801) - 400) / 16.0
          (s"g$g", s"d$g-$i", arm, x, y)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "id", "arm", "x", "y")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.subclassifiedAte(df, Seq("g"), "id", "arm",
          "x", "y", nStrata)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      val want = rows
        .filter(r => r._3 != null && r._4 != null && r._5 != null)
        .groupBy(_._1).map { case (g, rs) =>
          val n = rs.size
          val strat = rs.map(r => (r._2, r._3.booleanValue,
              r._4.longValue, BigInt(math.floor(r._5.doubleValue * 10000).toLong)))
            .sortBy { case (id, _, x, _) => (x, id) }
            .zipWithIndex.map { case ((_, t, _, y), i) =>
              (ntileOf(i, n, nStrata), t, y) }
          val cells = strat.groupBy(_._1).values.map { cs =>
            val nt = cs.count(_._2).toLong
            val nc = cs.size - nt
            val st = cs.filter(_._2).map(_._3).sum
            val sc = cs.filterNot(_._2).map(_._3).sum
            (nt, nc, st, sc)
          }.toVector
          val valid = cells.filter(c => c._1 > 0 && c._2 > 0)
          val w = valid.map { case (nt, nc, st, sc) =>
            BigInt(nt + nc) * ((st * 1000000) / nt - (sc * 1000000) / nc)
          }.sum
          val nu = valid.map(c => c._1 + c._2).sum
          (g, n.toLong, valid.size.toLong,
            if (nu > 0) Some((w / nu).toLong) else None)
        }.toSet
      assert(got == want, s"trial $trial (strata=$nStrata): " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: conformalCalibration matches a local seeded-split fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(16500 + trial)
      val covPct = 50 + rnd.nextInt(45)
      val seed = s"cf$trial"
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        (0 until 1 + rnd.nextInt(25)).map { i =>
          (s"g$g", s"d$g-$i", rnd.nextInt(33) / 32.0)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "id", "score")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.conformalCalibration(df, Seq("g"), "id",
          "score", covPct, seed)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))
        .toSet
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val tagged = rs.map { case (_, id, s) =>
          (id, math.floor(s * 10000).toLong,
            java.lang.Long.parseLong(md5hex(s"$seed:$id").take(4), 16) % 2 == 0)
        }
        val cal = tagged.filter(_._3).sortBy(c => (c._2, c._1))
        val ev = tagged.filterNot(_._3)
        val nCal = cal.size.toLong
        val k = if (nCal > 0) Some(((nCal + 1) * covPct + 99) / 100) else None
        val qhat = k.filter(_ <= nCal).map(kk => cal((kk - 1).toInt)._2)
        val nEval = ev.size.toLong
        val coverage =
          if (nEval == 0) None
          else if (qhat.isEmpty) Some(1000000L)
          else Some(ev.count(_._2 <= qhat.get) * 1000000L / nEval)
        (g, nCal, nEval, k, qhat, coverage)
      }.toSet
      assert(got == want, s"trial $trial (cov=$covPct): " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: minDetectableEffect matches a local moment fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(16600 + trial)
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { g =>
        val const = g == 0 // zero variance -> NULL mde
        (0 until 1 + rnd.nextInt(25)).map { _ =>
          val y: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else if (const) 4.25 else (rnd.nextInt(2001) - 1000) / 16.0
          (s"g$g", y)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "y")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.minDetectableEffect(df, Seq("g"), "y")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      val want = rows.filter(_._2 != null).groupBy(_._1).map { case (g, rs) =>
        val cs = rs.map(r => BigInt(math.floor(r._2.doubleValue * 100).toLong))
        val n = BigInt(cs.size)
        val s = cs.sum
        val ss = cs.map(c => c * c).sum
        val v = (n * ss - s * s) / (n * n)
        val mde = if (n > 1 && v > 0)
          Some(math.floor(2801585.0 *
            math.sqrt(2.0 * v.toDouble / n.toDouble)).toLong)
        else None
        (g, cs.size.toLong, v.toLong, mde)
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("fuzz: diffInDiff matches a local four-cell fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(16800 + trial)
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { g =>
        val missingCell = g == 0 // no control-post rows -> NULL estimate
        (0 until 2 + rnd.nextInt(25)).map { _ =>
          val arm: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null else rnd.nextBoolean()
          val post: java.lang.Boolean =
            if (rnd.nextInt(12) == 0) null
            else if (missingCell && arm != null && !arm.booleanValue) false
            else rnd.nextBoolean()
          val y: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(801) - 400) / 16.0
          (s"g$g", arm, post, y)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "arm", "post", "y")
        .repartition(1 + rnd.nextInt(4))
      val got = Regression.diffInDiff(df, Seq("g"), "arm", "post", "y")
        .collect()
        .map(r => (r.getString(0), (1 to 4).map(r.getLong).toVector,
          (5 to 9).map(i =>
            if (r.isNullAt(i)) None else Some(r.getLong(i))).toVector))
        .toSet
      val want = rows
        .filter(r => r._2 != null && r._3 != null && r._4 != null)
        .groupBy(_._1).map { case (g, rs) =>
          def cell(t: Boolean, p: Boolean) = rs.filter(r =>
            r._2.booleanValue == t && r._3.booleanValue == p)
            .map(r => BigInt(math.floor(r._4.doubleValue * 10000).toLong))
          def mean(c: Seq[BigInt]): Option[Long] =
            if (c.nonEmpty) Some(((c.sum * 100) / c.size).toLong) else None
          val (tPre, tPost) = (cell(true, false), cell(true, true))
          val (cPre, cPost) = (cell(false, false), cell(false, true))
          val means = Vector(mean(tPre), mean(tPost), mean(cPre), mean(cPost))
          val did = for {
            a <- means(1); b <- means(0); c <- means(3); d <- means(2)
          } yield (a - b) - (c - d)
          (g, Vector(tPre.size.toLong, tPost.size.toLong,
            cPre.size.toLong, cPost.size.toLong),
            means :+ did)
        }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(2)} / ${(want diff got).take(2)}")
    }
  }

  test("fuzz: normalPValueMicro stays within one micro of Simpson " +
    "integration and is symmetric") {
    // reference: 2*(1 - Phi(|z|)) by Simpson's rule on the density —
    // error ~1e-12, far below the A&S bound under test
    def pRef(zMicro: Long): Double = {
      val z = math.abs(zMicro) / 1e6
      val steps = 20000 // even
      val h = z / steps
      val dens = (x: Double) => math.exp(-x * x / 2.0)
      var s = dens(0.0) + dens(z)
      var i = 1
      while (i < steps) {
        s += dens(i * h) * (if (i % 2 == 1) 4.0 else 2.0)
        i += 1
      }
      val phi = 0.5 + s * h / 3.0 / math.sqrt(2.0 * math.Pi)
      2.0 * (1.0 - phi)
    }
    val rnd = new Random(16700)
    val zs = (0 until 40).map(_ => (rnd.nextInt(12000001) - 6000000).toLong) ++
      Seq(0L, 1000000L, -1959964L, 3000000L)
    val got = zs.toDF("z")
      .select(col("z"), Regression.normalPValueMicro(col("z")).as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    zs.foreach { z =>
      val ref = math.floor(1e6 * pRef(z)).toLong
      assert(math.abs(got(z) - ref) <= 1L,
        s"z=$z got=${got(z)} ref=$ref")
      assert(got(z) == got.getOrElse(-z, got(z)), s"asymmetric at $z")
    }
  }
}
