package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the behavioral-analytics event operators
  * against independent local folds: ordered funnels (each stage's
  * earliest qualifying timestamp gates the next), cohort retention over
  * UTC day grains with per-day deduplication, CUSUM's
  * running-sum-minus-running-min alarm arithmetic on truncating cents
  * divisions, and the power-of-two EWMA's exact integer weighting over
  * a truncated frame. Seeds are pinned so every trial reproduces.
  */
class EventFuzz2Spec extends SparkSpec {
  import spark.implicits._

  private val utc = java.time.ZoneOffset.UTC
  private val day0 = java.time.LocalDate.of(2024, 5, 1)
    .atStartOfDay(utc).toEpochSecond

  private def tsOf(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  private def dayOf(sec: Long): java.time.LocalDate =
    java.time.Instant.ofEpochSecond(sec).atZone(utc).toLocalDate

  test("fuzz: funnel matches a local earliest-qualifying-step fold") {
    val steps = Seq("view", "cart", "buy")
    for (trial <- 0 until 4) {
      val rnd = new Random(13900 + trial)
      val types = steps ++ Seq("noise", "other")
      val events = (0 until 5 + rnd.nextInt(12)).flatMap { u =>
        (0 until rnd.nextInt(12)).map { _ =>
          (s"u$u", types(rnd.nextInt(types.size)), rnd.nextInt(50).toLong)
        }
      }
      val df = rnd.shuffle(events).toDF("user", "etype", "ts")
        .repartition(1 + rnd.nextInt(4))
      val got = EventOps.funnel(df, "user", "etype", "ts", steps)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val byUser = events.groupBy(_._1)
      val want = {
        var reached = byUser.flatMap { case (u, es) =>
          es.filter(_._2 == steps.head).map(_._3).minOption.map(u -> _)
        }
        val counts = Vector.newBuilder[Long]
        counts += reached.size.toLong
        steps.tail.foreach { st =>
          reached = reached.flatMap { case (u, t) =>
            byUser.getOrElse(u, Seq.empty)
              .filter(e => e._2 == st && e._3 >= t).map(_._3)
              .minOption.map(u -> _)
          }
          counts += reached.size.toLong
        }
        counts.result().zip(steps).zipWithIndex.map { case ((n, st), i) =>
          ((i + 1).toLong, st, n) }.toSet
      }
      assert(got == want, s"trial $trial")
    }
  }

  test("fuzz: cohortRetention matches a local day-grain fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(14000 + trial)
      val events = (0 until 4 + rnd.nextInt(10)).flatMap { u =>
        (0 until 1 + rnd.nextInt(10)).map { _ =>
          (s"u$u", day0 + rnd.nextInt(20 * 86400).toLong)
        }
      }
      val df = rnd.shuffle(events).map { case (u, s) => (u, tsOf(s)) }
        .toDF("user", "ts").repartition(1 + rnd.nextInt(4))
      val got = EventOps.cohortRetention(df, "user", "ts")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val firstDay = events.groupBy(_._1).view
        .mapValues(es => es.map(e => dayOf(e._2)).min).toMap
      val want = events.map { case (u, s) => (u, dayOf(s)) }.distinct
        .groupBy { case (u, d) =>
          (firstDay(u), firstDay(u).until(d, java.time.temporal.ChronoUnit.DAYS))
        }
        .map { case ((cohort, off), us) =>
          (cohort.toString, off, us.size.toLong) }
        .toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: cusum and ewma match local cents folds") {
    for (trial <- 0 until 4) {
      val rnd = new Random(14100 + trial)
      val (kC, hC) = (rnd.nextInt(200).toLong, 50L + rnd.nextInt(500))
      val lags = 1 + rnd.nextInt(6)
      val events = (0 until 2 + rnd.nextInt(3)).flatMap { k =>
        (0 until 3 + rnd.nextInt(25)).map { _ =>
          val v: java.lang.Double =
            if (rnd.nextInt(12) == 0) null
            else (rnd.nextInt(4001) - 1000) / 16.0
          (s"k$k", tsOf(day0 + rnd.nextInt(12 * 86400).toLong), v)
        }
      }
      val df = rnd.shuffle(events).toDF("key", "ts", "v")
        .repartition(1 + rnd.nextInt(4))

      val daily = events.filter(_._3 != null).groupBy { e =>
        (e._1, dayOf(e._2.toInstant.getEpochSecond))
      }.map { case ((k, d), es) =>
        val cents = es.map(e => math.floor(e._3.doubleValue * 100).toLong)
        (k, d, es.size.toLong, cents.sum / cents.size) // truncating div
      }.toVector

      val gotC = EventOps.cusum(df, Seq("key"), "ts", "v", kC, hC)
        .collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .toSet
      val wantC = daily.groupBy(_._1).flatMap { case (k, ds) =>
        val ordered = ds.sortBy(_._2.toEpochDay)
        var cum = 0L
        var minCum = Long.MaxValue
        ordered.map { case (_, d, n, x) =>
          cum += x - kC
          minCum = math.min(minCum, cum)
          val s = cum - minCum
          (k, d.toString, n, x, s, s > hC)
        }
      }.toSet
      assert(gotC == wantC, s"trial $trial cusum (k=$kC h=$hC)")

      val gotE = EventOps.ewma(df, Seq("key"), "ts", "v", lags)
        .collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          r.getLong(3)))
        .toSet
      val wantE = daily.groupBy(_._1).flatMap { case (k, ds) =>
        val xs = ds.sortBy(_._2.toEpochDay).map(d => (d._2, d._4))
        xs.zipWithIndex.map { case ((d, _), t) =>
          val frame = xs.slice(math.max(0, t - lags + 1), t + 1).map(_._2)
          val num = frame.zipWithIndex.map { case (v, i) => v * (1L << i) }.sum
          (k, d.toString, xs(t)._2, num / ((1L << frame.size) - 1))
        }
      }.toSet
      assert(gotE == wantE, s"trial $trial ewma (lags=$lags)")
    }
  }
}
