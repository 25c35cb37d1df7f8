package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel counts only strictly-ordered conversions") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: purchase BEFORE the click — converts only to step 2
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "purchase", ts("2024-01-01 09:30:00")),
      (2L, "click", ts("2024-01-01 10:00:00")),
      // user 3: clicks without ever viewing — not even step 1
      (3L, "click", ts("2024-01-01 11:00:00")),
      // user 4: view only
      (4L, "view", ts("2024-01-01 12:00:00")))
      .toDF("user_id", "event_type", "t")
    val out = EventOps.funnel(ev, "user_id", "event_type", "t",
        Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("funnel step at the same timestamp as the previous step converts (inclusive)") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "t")
    val out = EventOps.funnel(ev, "user_id", "event_type", "t",
      Seq("view", "click")).orderBy("step_idx").collect()
    assert(out(1).getLong(2) == 1L)
  }

  test("cohortRetention: offsets measured from each user's first day, one row per user-day") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 15:00:00")), // same day twice
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-02 10:00:00")), (2L, ts("2024-01-03 10:00:00")))
      .toDF("user_id", "t")
      .withColumn("event_type", lit("view"))
    val out = EventOps.cohortRetention(ev, "user_id", "t")
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L)))
  }

  test("scd2Intervals: collapses restated values, closes at next change, last open") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "bronze"),
      (1L, 2L, ts("2024-01-02 10:00:00"), "bronze"), // restated — must collapse
      (1L, 3L, ts("2024-01-03 10:00:00"), "silver"),
      (1L, 4L, ts("2024-01-04 10:00:00"), "gold"),
      (2L, 5L, ts("2024-01-01 09:00:00"), "silver"))
      .toDF("user_id", "event_id", "t", "tier")
    val out = EventOps.scd2Intervals(ev, "user_id", "t", "event_id", "tier")
      .orderBy("user_id", "valid_from_ts")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString.take(19),
        Option(r.getTimestamp(3)).map(_.toString.take(19)).orNull,
        r.getBoolean(4))).toSeq
    assert(out == Seq(
      (1L, "bronze", "2024-01-01 10:00:00", "2024-01-03 10:00:00", false),
      (1L, "silver", "2024-01-03 10:00:00", "2024-01-04 10:00:00", false),
      (1L, "gold", "2024-01-04 10:00:00", null, true),
      (2L, "silver", "2024-01-01 09:00:00", null, true)))
  }

  test("scd2Intervals: NULL attribute forms and terminates intervals null-safely") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), Some("a")),
      (1L, 2L, ts("2024-01-02 10:00:00"), None), // a -> NULL is a change
      (1L, 3L, ts("2024-01-03 10:00:00"), None), // NULL restated — collapses
      (1L, 4L, ts("2024-01-04 10:00:00"), Some("a")))
      .toDF("user_id", "event_id", "t", "tier")
    val out = EventOps.scd2Intervals(ev, "user_id", "t", "event_id", "tier")
      .orderBy("user_id", "valid_from_ts")
      .collect().map(r => (Option(r.getString(1)).orNull, r.getBoolean(4))).toSeq
    assert(out == Seq(("a", false), (null, false), ("a", true)))
  }

  test("scd2Intervals: equal timestamps break ties on the tie column") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq((1L, 2L, t0, "b"), (1L, 1L, t0, "a"))
      .toDF("user_id", "event_id", "t", "tier")
    val out = EventOps.scd2Intervals(ev, "user_id", "t", "event_id", "tier")
      .orderBy("valid_from_ts", "tier").collect()
      .map(r => (r.getString(1), r.getBoolean(4))).toSeq
    // event_id 1 ("a") precedes 2 ("b"): a closes, b stays current
    assert(out == Seq(("a", false), ("b", true)))
  }

  test("gapFill: latest-in-day election, dense grid, forward-filled gaps") {
    val ev = Seq(
      ("k", ts("2024-01-01 08:00:00"), 1.5),
      ("k", ts("2024-01-01 20:00:00"), 2.5),  // later same day wins
      ("k", ts("2024-01-03 10:00:00"), 4.0),  // day 2 is a gap
      ("solo", ts("2024-02-01 00:00:00"), 9.0))
      .toDF("key", "t", "v")
    val out = EventOps.gapFill(ev, Seq("key"), "t", "v")
      .orderBy("key", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(out == Seq(
      ("k", "2024-01-01", 2500000L, true),
      ("k", "2024-01-02", 2500000L, false), // carried forward
      ("k", "2024-01-03", 4000000L, true),
      ("solo", "2024-02-01", 9000000L, true)))
  }

  test("gapFill: exact-timestamp ties elect the larger value; spans are per-key") {
    val t0 = ts("2024-01-05 12:00:00")
    val ev = Seq(("a", t0, 3.0), ("a", t0, 7.0),
      ("b", ts("2024-03-01 00:00:00"), 1.0),
      ("b", ts("2024-03-02 00:00:00"), 2.0)).toDF("key", "t", "v")
    val out = EventOps.gapFill(ev, Seq("key"), "t", "v")
      .orderBy("key", "day").collect()
    // key a: one day, max-value election; key b: its own 2-day span only
    assert(out.length == 3)
    assert(out.head.getLong(2) == 7000000L)
    assert(out.map(_.getDate(1).toString).toSeq ==
      Seq("2024-01-05", "2024-03-01", "2024-03-02"))
  }

  test("cusum closed form equals the max(0, ...) recursion") {
    val days = Seq(10.0, 12.0, 9.0, 14.0, 14.5, 15.0, 8.0, 13.0)
    val ev = days.zipWithIndex.map { case (v, i) =>
      ("k", java.sql.Timestamp.valueOf(f"2024-02-${i + 1}%02d 12:00:00"), v)
    }.toDF("key", "t", "v")
    val out = EventOps.cusum(ev, Seq("key"), "t", "v",
        kCents = 1100L, hCents = 300L)
      .orderBy("day").collect()
    // reference recursion over the same cents-quantized daily means
    var s = 0L
    val expected = days.map { v =>
      s = math.max(0L, s + (math.floor(v * 100).toLong - 1100L))
      s
    }
    assert(out.map(_.getLong(out.head.fieldIndex("s_cents"))).toSeq == expected)
    assert(out.map(_.getBoolean(out.head.fieldIndex("alarm"))).toSeq ==
      expected.map(_ > 300L))
  }

  test("cusum statistic is never negative and resets after a dip") {
    val ev = Seq(
      ("k", java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 1.0),
      ("k", java.sql.Timestamp.valueOf("2024-02-02 00:00:00"), 99.0))
      .toDF("key", "t", "v")
    val out = EventOps.cusum(ev, Seq("key"), "t", "v", 5000L, 100L)
      .orderBy("day").collect()
    assert(out(0).getLong(out(0).fieldIndex("s_cents")) == 0L)
    assert(out(1).getLong(out(1).fieldIndex("s_cents")) == 4900L)
  }

  test("ewma matches the truncated geometric reference, warm-up included") {
    val days = Seq(10.0, 20.0, 40.0, 40.0, 40.0)
    val ev = days.zipWithIndex.map { case (v, i) =>
      ("k", java.sql.Timestamp.valueOf(f"2024-02-${i + 1}%02d 12:00:00"), v)
    }.toDF("key", "t", "v")
    val out = EventOps.ewma(ev, Seq("key"), "t", "v", lags = 3)
      .orderBy("day").collect()
    val cents = days.map(v => math.floor(v * 100).toLong)
    val expected = cents.indices.map { t =>
      val frame = cents.slice(math.max(0, t - 2), t + 1)
      val m = frame.length
      frame.zipWithIndex.map { case (x, i) => x << i }.sum / ((1L << m) - 1)
    }
    assert(out.map(_.getLong(out.head.fieldIndex("ewma_cents"))).toSeq ==
      expected)
    // steady state: constant input converges to the constant
    assert(out.last.getLong(out.last.fieldIndex("ewma_cents")) == 4000L)
  }

  test("seasonalIndex is volume-weighted: hot low-volume day still indexes hot") {
    // Mondays (2024-02-05/12): value 30 twice; Tuesdays: value 10 six times
    val ev = (Seq("2024-02-05", "2024-02-12").map((_, 30.0)) ++
      (1 to 3).flatMap(_ => Seq("2024-02-06", "2024-02-13").map((_, 10.0))))
      .map { case (d, v) => ("k", java.sql.Timestamp.valueOf(s"$d 10:00:00"), v) }
      .toDF("key", "t", "v")
    val out = EventOps.seasonalIndex(ev, Seq("key"), "t", "v")
      .orderBy("dow").collect()
    assert(out.length == 2)
    // overall mean = (2·3000 + 6·1000)/8 = 1500 cents
    val mon = out.find(_.getLong(1) == 2).get // Spark dow: Monday = 2
    assert(mon.getLong(mon.fieldIndex("mean_cents")) == 3000L)
    assert(mon.getLong(mon.fieldIndex("idx_micro")) == 2000000L)
    val tue = out.find(_.getLong(1) == 3).get
    assert(tue.getLong(tue.fieldIndex("idx_micro")) == 666666L)
  }

  test("rollingZ matches the cleared-denominator reference; flat window is null") {
    val days = Seq(10.0, 10.0, 10.0, 10.0, 30.0)
    val ev = days.zipWithIndex.map { case (v, i) =>
      ("k", java.sql.Timestamp.valueOf(f"2024-02-${i + 1}%02d 12:00:00"), v)
    }.toDF("key", "t", "v")
    val out = EventOps.rollingZ(ev, Seq("key"), "t", "v", windowDays = 7)
      .orderBy("day").collect()
    // first four days: zero variance → null z, no spike
    assert(out.take(4).forall(r => r.isNullAt(r.fieldIndex("z_micro"))))
    assert(out.take(4).forall(r => !r.getBoolean(r.fieldIndex("is_spike"))))
    // day 5: cents = (1000×4, 3000); m=5, S=7000, SS=13000000
    val m = 5L; val s = 7000L; val ss = 13000000L; val x = 3000L
    val expected = math.floor(
      (m * x - s) * 1e6 / math.sqrt((m * (m * ss - s * s)).toDouble)).toLong
    val last = out.last
    assert(last.getLong(last.fieldIndex("z_micro")) == expected)
    assert(!last.getBoolean(last.fieldIndex("is_spike")) == (math.abs(expected) <= 2000000L))
  }

  private def acfRef(xs: Seq[Long], k: Int): Long = {
    val n = xs.length
    val mean = xs.sum.toDouble / n
    val num = (0 until n - k).map(t => (xs(t) - mean) * (xs(t + k) - mean)).sum
    val den = xs.map(x => (x - mean) * (x - mean)).sum
    math.floor(num * 1e6 / den).toLong
  }

  test("acf matches the textbook per-lag formula on a hand series") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val df = xs.zipWithIndex.map { case (x, i) => ("a", i, x) }
      .toDF("g", "i", "x")
    val out = EventOps.acf(df, Seq("g"), "i", "x", maxLag = 3)
      .orderBy("lag").collect()
    assert(out.length == 3)
    (1 to 3).foreach { k =>
      val r = out(k - 1)
      assert(r.getLong(r.fieldIndex("n")) == 8L)
      assert(r.getLong(r.fieldIndex("acf_micro")) == acfRef(xs, k),
        s"lag $k")
    }
  }

  test("acf: constant series and too-short series yield NULL") {
    val flat = Seq(("f", 0, 5L), ("f", 1, 5L), ("f", 2, 5L)).toDF("g", "i", "x")
    val short = Seq(("s", 0, 1L), ("s", 1, 2L)).toDF("g", "i", "x")
    val out = EventOps.acf(flat.unionAll(short), Seq("g"), "i", "x", maxLag = 3)
      .collect()
    assert(out.length == 6)
    // flat: den = 0 at every lag; short: lags 2,3 exceed n-1
    assert(out.filter(_.getString(0) == "f")
      .forall(_.isNullAt(3)))
    val sRows = out.filter(_.getString(0) == "s")
      .map(r => r.getInt(1) -> r).toMap
    assert(!sRows(1).isNullAt(3) && sRows(2).isNullAt(3) && sRows(3).isNullAt(3))
  }

  test("ccf: lag 0 equals Pearson; a planted 2-step lead peaks at lag 2") {
    // y is x delayed by 2 steps: x leads y, so ccf should peak at k=2
    val x = Seq(5L, 1L, 9L, 2L, 8L, 3L, 7L, 1L, 6L, 4L, 9L, 2L, 8L, 3L, 7L, 1L)
    val y = Seq(0L, 0L) ++ x.dropRight(2)
    val df = x.indices.map(i => ("g", i, x(i), y(i))).toDF("g", "t", "x", "y")
    val out = EventOps.ccf(df, Seq("g"), "t", "x", "y", maxLag = 4)
      .orderBy("lag").collect()
      .map(r => r.getInt(1) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    val peak = out.values.flatten.max
    assert(out(2).contains(peak), s"peak not at lag 2: $out")
    assert(peak > 700000L)
    // lag-0 reference: plain Pearson, n = 16 = 2^4 so the n^2 clearing
    // is an exact power-of-two scale and the doubles agree bitwise
    val n = x.length.toDouble
    val (sx, sy) = (x.sum.toDouble, y.sum.toDouble)
    val num = n * n * x.zip(y).map { case (a, b) => a * b }.sum.toDouble -
      n * sy * sx - n * sx * sy + n * sx * sy
    val dx = n * n * x.map(a => a * a).sum - n * sx * sx
    val dy = n * n * y.map(a => a * a).sum - n * sy * sy
    val expected = math.floor(num * 1e6 / math.sqrt(dx * dy)).toLong
    assert(out(0).contains(expected))
  }

  test("ccf: constant x side yields NULL at every lag") {
    val df = (0 until 6).map(i => ("g", i, 4L, i.toLong)).toDF("g", "t", "x", "y")
    val out = EventOps.ccf(df, Seq("g"), "t", "x", "y", maxLag = 2).collect()
    assert(out.length == 3 && out.forall(_.isNullAt(3)))
  }

  test("acf of a perfectly alternating series is -1 at lag 1 scale-free") {
    // x = +1/-1 alternating, n even -> r1 very near -1 (exactly
    // -(n-1)/n after mean-0 cancellation); micro floor of -14/16
    val xs = (0 until 16).map(i => if (i % 2 == 0) 1L else -1L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }.toDF("g", "i", "x")
    val r1 = EventOps.acf(df, Seq("g"), "i", "x", maxLag = 1).collect().head
    assert(r1.getLong(r1.fieldIndex("acf_micro")) == acfRef(xs, 1))
    assert(r1.getLong(r1.fieldIndex("acf_micro")) == -937500L)
  }

  test("pathTrigrams: windows slide within a user, never across; " +
      "count-desc then path tie-break") {
    import java.sql.Timestamp
    def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 08:$i%02d:00")
    // u1: a b c d → (a,b,c), (b,c,d); u2: a b c → (a,b,c)
    val ev = Seq((1L, ts(1), "a", 1L), (1L, ts(2), "b", 2L),
      (1L, ts(3), "c", 3L), (1L, ts(4), "d", 4L),
      (2L, ts(1), "a", 5L), (2L, ts(2), "b", 6L), (2L, ts(3), "c", 7L))
      .toDF("u", "ts", "t", "id")
    val out = EventOps.pathTrigrams(ev, "u", "ts", "t", "id", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))
        -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(("a", "b", "c")) == ((2L, 1L)))
    assert(out(("b", "c", "d")) == ((1L, 2L)))
    assert(out.size == 2) // no cross-user (c,d,a)-style windows
  }

  test("decompose: constant series is pure trend; a spike lands in the " +
      "residual; reconstruction is exact by construction") {
    import java.sql.Timestamp
    def day(i: Int) = Timestamp.valueOf(f"2024-01-$i%02d 08:00:00")
    val flat = (1 to 10).map(i => ("flat", day(i), 7.0))
    val spiky = (1 to 14).map(i =>
      ("spiky", day(i), if (i == 8) 50.0 else 7.0))
    val out = EventOps.decompose((flat ++ spiky).toDF("k", "ts", "v"),
      Seq("k"), "ts", "v").collect()
    val byKey = out.groupBy(_.getString(0))
    byKey("flat").foreach { r =>
      assert(r.getLong(r.fieldIndex("trend_cents")) == 700L)
      assert(r.getLong(r.fieldIndex("seasonal_cents")) == 0L)
      assert(r.getLong(r.fieldIndex("residual_cents")) == 0L)
    }
    out.foreach { r => // additive identity holds exactly everywhere
      assert(r.getLong(r.fieldIndex("x_cents")) ==
        r.getLong(r.fieldIndex("trend_cents")) +
          r.getLong(r.fieldIndex("seasonal_cents")) +
          r.getLong(r.fieldIndex("residual_cents")))
    }
    val sp = byKey("spiky")
      .map(r => r.getDate(r.fieldIndex("day")).toString ->
        r.getLong(r.fieldIndex("residual_cents"))).toMap
    assert(sp("2024-01-08") > sp.removed("2024-01-08").values.max,
      sp.toString) // the spike dominates every other residual
  }

  test("rfmSegments: exact triples, recency anchored to the corpus max, " +
      "worst-first quintiles put the best entity in tile 5") {
    import java.sql.Timestamp
    // user i: one event on day i of Jan 2024, value i → user 10 is the
    // most recent, most valuable; ties on freq break by entity id
    val df = (1 to 10).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"), i * 1.0))
      .toDF("u", "ts", "v")
    val out = EventOps.rfmSegments(df, "u", "ts", "v")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getLong(out(10L).fieldIndex("r_days")) == 0L)
    assert(out(1L).getLong(out(1L).fieldIndex("r_days")) == 9L)
    assert(out(10L).getLong(out(10L).fieldIndex("monetary_cents")) == 1000L)
    assert(out(10L).getLong(out(10L).fieldIndex("r_score")) == 5L)
    assert(out(10L).getLong(out(10L).fieldIndex("m_score")) == 5L)
    assert(out(1L).getLong(out(1L).fieldIndex("r_score")) == 1L)
    assert(out(1L).getLong(out(1L).fieldIndex("m_score")) == 1L)
    // all-equal frequency: the quintile is decided purely by the id
    // tie-break — entities 1,2 → tile 1, …, 9,10 → tile 5
    assert(out(1L).getLong(out(1L).fieldIndex("f_score")) == 1L)
    assert(out(10L).getLong(out(10L).fieldIndex("f_score")) == 5L)
    assert(out(5L).getLong(out(5L).fieldIndex("f_score")) == 3L)
  }

  test("funnel matches a per-user greedy-chain reference on random streams") {
    // Random event streams (few users, few types, coarse timestamps →
    // heavy same-timestamp collisions) against the textbook reference:
    // step k+1 converts at the user's EARLIEST step-(k+1) event at-or-
    // after their step-k time. Random ties exercise the inclusive
    // same-timestamp rule beyond the single hand case.
    val rnd = new scala.util.Random(9901)
    val steps = Seq("view", "click", "buy")
    for (seed <- 1 to 4) {
      val types = Seq("view", "click", "buy", "other")
      val events = (0 until 300).map { _ =>
        (rnd.nextInt(12).toLong, types(rnd.nextInt(types.size)),
          ts(f"2024-01-01 10:00:${rnd.nextInt(30)}%02d"))
      }
      val out = EventOps.funnel(events.toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", steps)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      // reference: greedy earliest-chain per user
      val byUser = events.groupBy(_._1)
      val survivors = Array.fill(steps.size)(0L)
      for ((_, evs) <- byUser) {
        var t: Option[java.sql.Timestamp] = None
        var k = 0
        var continue = true
        while (k < steps.size && continue) {
          val candidates = evs.filter(e => e._2 == steps(k) &&
            t.forall(prev => !e._3.before(prev)))
          if (candidates.isEmpty) continue = false
          else {
            t = Some(candidates.map(_._3).min((a: java.sql.Timestamp,
              b: java.sql.Timestamp) => a.compareTo(b)))
            survivors(k) += 1
            k += 1
          }
        }
      }
      steps.indices.foreach { i =>
        assert(out(i + 1L) == survivors(i),
          s"seed=$seed step=${i + 1}: engine=${out(i + 1L)} ref=${survivors(i)}")
      }
    }
  }
}
