package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the time-series screening operators
  * against independent local folds: day-of-week seasonal indices
  * (cleared one-division ratios), rolling z-scores, classic additive
  * decomposition (centered trend, dow seasonal means on truncating
  * divisions of negative detrended values), ACF/CCF's cleared-
  * denominator moment arithmetic, top-k path trigrams, and RFM
  * quintiles with ntile's exact remainder placement under pinned tie
  * orders. Seeds are pinned so every trial reproduces.
  */
class EventFuzz3Spec extends SparkSpec {
  import spark.implicits._

  private val utc = java.time.ZoneOffset.UTC
  private val day0 = java.time.LocalDate.of(2024, 7, 1)
    .atStartOfDay(utc).toEpochSecond

  private def tsOf(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  private def dayOf(sec: Long): java.time.LocalDate =
    java.time.Instant.ofEpochSecond(sec).atZone(utc).toLocalDate

  private def sparkDow(d: java.time.LocalDate): Long =
    (d.getDayOfWeek.getValue % 7) + 1L // Spark: 1=Sunday..7=Saturday

  test("fuzz: seasonalIndex, rollingZ, and decompose match local folds") {
    for (trial <- 0 until 3) {
      val rnd = new Random(14200 + trial)
      val events = (0 until 2 + rnd.nextInt(3)).flatMap { k =>
        (0 until 5 + rnd.nextInt(30)).map { _ =>
          val v: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(4001) - 1000) / 16.0
          (s"k$k", tsOf(day0 + rnd.nextInt(16 * 86400).toLong), v)
        }
      }
      val df = rnd.shuffle(events).toDF("key", "ts", "v")
        .repartition(1 + rnd.nextInt(4))
      val valid = events.filter(_._3 != null).map(e =>
        (e._1, dayOf(e._2.toInstant.getEpochSecond),
          math.floor(e._3.doubleValue * 100).toLong))

      // --- seasonalIndex
      val gotS = EventOps.seasonalIndex(df, Seq("key"), "ts", "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .toSet
      val wantS = valid.groupBy(_._1).flatMap { case (k, es) =>
        val byDow = es.groupBy(e => sparkDow(e._2))
        val tn = BigInt(es.size)
        val ts = es.map(e => BigInt(e._3)).sum
        byDow.flatMap { case (dow, ds) =>
          val n = BigInt(ds.size)
          val s = ds.map(d => BigInt(d._3)).sum
          if (ts > 0)
            Some((k, dow, ds.size.toLong, (s / n).toLong,
              ((s * tn * 1000000) / (n * ts)).toLong))
          else None
        }
      }.toSet
      assert(gotS == wantS, s"trial $trial seasonal")

      // --- rollingZ
      val wd = 2 + rnd.nextInt(5)
      val gotZ = EventOps.rollingZ(df, Seq("key"), "ts", "v", wd)
        .collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
        .toSet
      val dailyMean = valid.groupBy(e => (e._1, e._2)).map { case ((k, d), es) =>
        (k, d, es.map(_._3).sum / es.size) // truncating
      }.toVector
      val wantZ = dailyMean.groupBy(_._1).flatMap { case (k, ds) =>
        val xs = ds.sortBy(_._2.toEpochDay)
        xs.zipWithIndex.map { case ((_, d, x), t) =>
          val fr = xs.slice(math.max(0, t - wd + 1), t + 1).map(_._3)
          val m = fr.size.toLong
          val s = fr.sum
          val ss = fr.map(v => v * v).sum
          val z = if (m * ss - s * s > 0)
            Some(math.floor((m * x - s).toDouble * 1e6 /
              math.sqrt((m * (m * ss - s * s)).toDouble)).toLong)
          else None
          (k, d.toString, x, z, z.exists(v => math.abs(v) > 2000000L))
        }
      }.toSet
      assert(gotZ == wantZ, s"trial $trial rollingZ (wd=$wd)")

      // --- decompose
      val hw = 1 + rnd.nextInt(3)
      val gotD = EventOps.decompose(df, Seq("key"), "ts", "v", hw)
        .collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSet
      val dailySum = valid.groupBy(e => (e._1, e._2)).map { case ((k, d), es) =>
        (k, d, es.map(_._3).sum)
      }.toVector
      val wantD = dailySum.groupBy(_._1).flatMap { case (k, ds) =>
        val xs = ds.sortBy(_._2.toEpochDay)
        val trended = xs.zipWithIndex.map { case ((_, d, x), t) =>
          val fr = xs.slice(math.max(0, t - hw),
            math.min(xs.size, t + hw + 1)).map(_._3)
          (d, x, fr.sum / fr.size) // truncating
        }
        val seas = trended.groupBy(t => sparkDow(t._1)).view.mapValues { ts =>
          (ts.map(t => BigInt(t._2 - t._3)).sum / ts.size).toLong
        }.toMap
        trended.map { case (d, x, tr) =>
          val se = seas(sparkDow(d))
          (k, d.toString, x, tr, se, x - tr - se)
        }
      }.toSet
      assert(gotD == wantD, s"trial $trial decompose (hw=$hw)")
    }
  }

  test("fuzz: acf and ccf match local cleared-moment folds") {
    for (trial <- 0 until 3) {
      val rnd = new Random(14300 + trial)
      val maxLag = 1 + rnd.nextInt(4)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { k =>
        val n = 2 + rnd.nextInt(15)
        (0 until n).map { i =>
          (s"k$k", i.toLong, (rnd.nextInt(21) - 10).toLong,
            (rnd.nextInt(21) - 10).toLong)
        }
      }
      val df = rnd.shuffle(rows).toDF("key", "pos", "x", "y")
        .repartition(1 + rnd.nextInt(4))

      val gotA = EventOps.acf(df, Seq("key"), "pos", "x", maxLag)
        .collect()
        .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      val wantA = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val xs = rs.sortBy(_._2).map(r => BigInt(r._3))
        val n = BigInt(xs.size)
        val s = xs.sum
        val ss = xs.map(x => x * x).sum
        (1 to maxLag).map { lag =>
          val pairs = xs.dropRight(lag).zip(xs.drop(lag))
          val p = pairs.map { case (a, b) => a * b }.sum
          val a = pairs.map(_._1).sum
          val b = pairs.map(_._2).sum
          val num = n * n * p - n * s * (a + b) + (n - lag) * s * s
          val den = n * n * ss - n * s * s
          val acf = if (den > 0 && n > lag)
            Some(math.floor(num.toDouble * 1000000.0 / den.toDouble).toLong)
          else None
          (k, lag.toLong, xs.size.toLong, acf)
        }
      }.toSet
      assert(gotA == wantA, s"trial $trial acf (maxLag=$maxLag)")

      val gotC = EventOps.ccf(df, Seq("key"), "pos", "x", "y", maxLag)
        .collect()
        .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      val wantC = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val srt = rs.sortBy(_._2)
        val xs = srt.map(r => BigInt(r._3))
        val ys = srt.map(r => BigInt(r._4))
        val n = BigInt(xs.size)
        val sx = xs.sum; val sy = ys.sum
        val dx = n * n * xs.map(x => x * x).sum - n * sx * sx
        val dy = n * n * ys.map(y => y * y).sum - n * sy * sy
        (0 to maxLag).map { lag =>
          val pairs = xs.dropRight(lag).zip(ys.drop(lag))
          val p = pairs.map { case (a, b) => a * b }.sum
          val a = pairs.map(_._1).sum
          val b = pairs.map(_._2).sum
          val num = n * n * p - n * sy * a - n * sx * b + (n - lag) * sx * sy
          val ccf = if (dx > 0 && dy > 0 && n > lag)
            Some(math.floor(num.toDouble * 1000000.0 /
              math.sqrt(dx.toDouble * dy.toDouble)).toLong)
          else None
          (k, lag.toLong, xs.size.toLong, ccf)
        }
      }.toSet
      assert(gotC == wantC, s"trial $trial ccf")
    }
  }

  test("fuzz: pathTrigrams and rfmSegments match local folds") {
    def ntileOf(pos: Int, n: Int, tiles: Int = 5): Long = {
      val q = n / tiles; val r = n % tiles
      var acc = 0
      (1 to tiles).foreach { t =>
        acc += (if (t <= r) q + 1 else q)
        if (pos < acc) return t.toLong
      }
      tiles.toLong
    }
    for (trial <- 0 until 3) {
      val rnd = new Random(14400 + trial)
      val types = IndexedSeq("a", "b", "c")
      val k = 2 + rnd.nextInt(8)
      val events = (0 until 4 + rnd.nextInt(8)).flatMap { u =>
        (0 until rnd.nextInt(12)).map { i =>
          (s"u$u", rnd.nextInt(5).toLong, u * 1000L + i,
            types(rnd.nextInt(types.size)))
        }
      }
      val df = rnd.shuffle(events).toDF("user", "ts", "tie", "etype")
        .repartition(1 + rnd.nextInt(4))
      val gotP = EventOps.pathTrigrams(df, "user", "ts", "etype", "tie", k)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      val wantP = events.groupBy(_._1).values.flatMap { es =>
        es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3).filter(_.size == 3)
      }.toVector.groupBy(identity).view.mapValues(_.size.toLong).toVector
        .sortBy { case (p, n) => (-n, p(0), p(1), p(2)) }
        .zipWithIndex.take(k)
        .map { case ((p, n), i) => (p(0), p(1), p(2), n, (i + 1).toLong) }
        .toSet
      assert(gotP == wantP, s"trial $trial paths (k=$k)")

      val rfmEvents = (0 until 6 + rnd.nextInt(12)).flatMap { u =>
        (0 until 1 + rnd.nextInt(6)).map { _ =>
          (s"e$u", tsOf(day0 + rnd.nextInt(20 * 86400).toLong),
            (rnd.nextInt(4001) - 500) / 16.0)
        }
      }
      val rDf = rnd.shuffle(rfmEvents).toDF("id", "ts", "v")
        .repartition(1 + rnd.nextInt(4))
      val gotR = EventOps.rfmSegments(rDf, "id", "ts", "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
        .toSet
      val ents = rfmEvents.groupBy(_._1).map { case (id, es) =>
        val last = es.map(_._2.toInstant.getEpochSecond).max
        (id, last, es.size.toLong,
          es.map(e => math.floor(e._3 * 100).toLong).sum)
      }.toVector
      val maxLast = ents.map(_._2).max
      val withR = ents.map { case (id, last, f, m) =>
        (id, dayOf(last).until(dayOf(maxLast),
          java.time.temporal.ChronoUnit.DAYS), f, m)
      }
      val n = withR.size
      def scores(ord: Vector[(String, Long, Long, Long)]): Map[String, Long] =
        ord.zipWithIndex.map { case (e, i) => e._1 -> ntileOf(i, n) }.toMap
      val rS = scores(withR.sortBy(e => (-e._2, e._1)))
      val fS = scores(withR.sortBy(e => (e._3, e._1)))
      val mS = scores(withR.sortBy(e => (e._4, e._1)))
      val wantR = withR.map { case (id, rd, f, m) =>
        (id, rd, f, m, rS(id), fS(id), mS(id)) }.toSet
      assert(gotR == wantR, s"trial $trial rfm")
    }
  }
}
