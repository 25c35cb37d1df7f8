package graft.streaming

import graft.SparkSpec
import graft.ops.MergeOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import scala.util.Random

/** Stream/batch TWIN differential (r14): the bench replay queries and
  * their batch counterparts (q_stream_tumbling vs q_events_tumbling,
  * q_stream_sessionize vs q_events_sessionize, q_stream_dedup vs the
  * batch distinct) compute the same answers by construction — this spec
  * fuzzes that equivalence on RANDOM event sets replayed at RANDOM
  * micro-batch boundaries, so boundary-spanning state — the thing the
  * single-batch bench replays deliberately skip — is checked against the
  * batch operator, not just hand-picked cases (the RetrievalFuzzSpec
  * pattern applied to the replay harness itself).
  *
  * Replays are event-time ordered (the harness contract): the watermark
  * then lags every arrival, so nothing is late-dropped and the finished
  * stream must equal the batch result exactly. Timestamps carry random
  * sub-second millis to exercise the floor-second gap semantics that
  * streamingSessionize documents against MergeOps.sessionize.
  */
class StreamBatchTwinSpec extends SparkSpec {
  import spark.implicits._

  private val types = Seq("click", "view", "purchase")

  /** Random (ts, user, type, value) events over a ~6 h span, ts-sorted. */
  private def randomEvents(rnd: Random, n: Int): Seq[(Timestamp, Long, String, Double)] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (1 to n).map { _ =>
      val t = base + rnd.nextInt(6 * 3600) * 1000L + rnd.nextInt(1000)
      (new Timestamp(t), rnd.nextInt(7).toLong,
        types(rnd.nextInt(types.length)), rnd.nextInt(1000) / 100.0)
    }.sortBy(_._1.getTime)
  }

  /** Split into 1..5 batches at random cut points (order preserved). */
  private def randomBatches[T](rnd: Random, rows: Seq[T]): Seq[Seq[T]] = {
    val k = 1 + rnd.nextInt(5)
    val cuts = (Seq(0, rows.size) ++ (1 until k).map(_ => rnd.nextInt(rows.size + 1)))
      .sorted.distinct
    cuts.zip(cuts.tail).map { case (a, b) => rows.slice(a, b) }.filter(_.nonEmpty)
  }

  test("tumbling agg: multi-batch replay equals the batch twin on random events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(77)
    for (trial <- 1 to 2) {
      val rows = randomEvents(rnd, 200 + 100 * trial)
      val batchDf = rows.toDF("ts", "user_id", "event_type", "value")
        .select(col("ts"), col("event_type"), col("value"))
      val expected = StreamingOps.tumblingAgg(batchDf, width = "1 hour")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
        .toMap
      val mem = MemoryStream[(Timestamp, String, Double)]
      val agg = StreamingOps.streamingTumblingAgg(
        mem.toDF().toDF("ts", "event_type", "value"),
        width = "1 hour", watermark = "2 hours")
      val sink = s"twin_tumbling_$trial"
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try {
        randomBatches(rnd, rows.map(r => (r._1, r._3, r._4)))
          .foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val got = spark.table(sink).collect()
          .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
            (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
          .toMap
        assert(got.keySet == expected.keySet, s"trial $trial: window/key sets differ")
        got.foreach { case (k, (n, s)) =>
          val (en, es) = expected(k)
          assert(n == en && math.abs(s - es) < 1e-6,
            s"trial $trial window $k: stream ($n, $s) vs batch ($en, $es)")
        }
      } finally q.stop()
    }
  }

  test("sessionize: multi-batch replay equals the batch twin on random events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(78)
    val gap = 1800L
    for (trial <- 1 to 2) {
      // Cluster arrivals per user so sessions of length > 1 actually form:
      // random events over 6 h across 7 users rarely fall within 30 min of
      // each other, so bias half the events to echo a recent one.
      val base = randomEvents(rnd, 150 + 50 * trial)
      val rows = base.flatMap { e =>
        if (rnd.nextBoolean()) Seq(e)
        else Seq(e, (new Timestamp(e._1.getTime + rnd.nextInt(3600) * 1000L),
          e._2, e._3, rnd.nextInt(1000) / 100.0))
      }.sortBy(_._1.getTime)
      val batchDf = rows.toDF("ts", "user_id", "event_type", "value")
      val expected = MergeOps.sessionize(batchDf, "user_id", "ts", gap)
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"),
          count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).getTime,
          r.getLong(3), math.round(r.getDouble(4) * 100)))
        .toSet
      val mem = MemoryStream[StreamingOps.SessionInput]
      val sessions = StreamingOps.streamingSessionize(
        mem.toDS(), gapSeconds = gap, watermarkDelay = "30 minutes")
      val sink = s"twin_sessionize_$trial"
      val q = sessions.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        val inputs = rows.map(r => StreamingOps.SessionInput(r._2, r._1, r._4))
        randomBatches(rnd, inputs)
          .foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        // the q_stream_sessionize sentinel dance: push the watermark past
        // every open session's timeout, then let the timeouts fire
        val maxTs = rows.last._1.getTime
        def sentinel(i: Int) = StreamingOps.SessionInput(-1L,
          new Timestamp(maxTs + (gap + 3600L * i) * 1000), 0.0)
        mem.addData(sentinel(1)); q.processAllAvailable()
        mem.addData(sentinel(2)); q.processAllAvailable()
        val got = spark.table(sink).filter(col("user_id") =!= -1L).collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
            r.getLong(2), math.round(r.getDouble(3) * 100)))
          .toSet
        // sessions with >1 event must exist or the fuzz is vacuous
        assert(expected.exists(_._3 > 1L), s"trial $trial: no multi-event sessions generated")
        assert(got == expected,
          s"trial $trial: stream sessions ${got.size} vs batch ${expected.size}; " +
            s"only-stream=${(got -- expected).take(3)} only-batch=${(expected -- got).take(3)}")
      } finally q.stop()
    }
  }

  test("interval join: multi-batch replay equals the batch range join on random events") {
    // The stream-stream twin: clicks and purchases arrive interleaved
    // across random batch boundaries (the state store must buffer each
    // side until the other's matches arrive — exactly what the bench
    // replay's single-batch enqueue never exercises), and the finished
    // stream must equal the batch range join p_ts ∈ [ts − 1h, ts].
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(80)
    for (trial <- 1 to 2) {
      val clicksRows = randomEvents(rnd, 120).zipWithIndex
        .map { case (e, i) => (1000L + i, e._2, e._1) } // (click_id, user, ts)
      val purchRows = randomEvents(rnd, 120).zipWithIndex
        .map { case (e, i) => (5000L + i, e._2, e._1, e._4) }
      val expected = clicksRows.flatMap { case (cid, u, ts) =>
        purchRows.collect {
          case (pid, pu, pts, amt)
            if pu == u && pts.getTime <= ts.getTime &&
              pts.getTime >= ts.getTime - 3600L * 1000 =>
            (cid, pid, math.round(amt * 100))
        }
      }.toSet
      assert(expected.nonEmpty, s"trial $trial: no matches generated — vacuous")
      val clicks = MemoryStream[(Long, Long, Timestamp)]
      val purchases = MemoryStream[(Long, Long, Timestamp, Double)]
      val joined = StreamingOps.streamingIntervalJoin(
        clicks.toDF().toDF("click_id", "user_id", "ts"),
        purchases.toDF().toDF("purchase_id", "p_user", "p_ts", "amount"),
        leftKey = "user_id", rightKey = "p_user", leftTs = "ts", rightTs = "p_ts",
        lookback = "1 hour", watermarkDelay = "365 days")
      val sink = s"twin_interval_$trial"
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        // interleave: alternate batches between the two sides so matches
        // must form across the batch boundary in BOTH directions
        val cb = randomBatches(rnd, clicksRows)
        val pb = randomBatches(rnd, purchRows)
        (0 until math.max(cb.size, pb.size)).foreach { i =>
          if (i < cb.size) clicks.addData(cb(i): _*)
          if (i < pb.size) purchases.addData(pb(i): _*)
          q.processAllAvailable()
        }
        val got = spark.table(sink)
          .select(col("click_id"), col("purchase_id"), col("amount"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
          .toSet
        assert(got == expected,
          s"trial $trial: stream ${got.size} vs batch ${expected.size}; " +
            s"only-stream=${(got -- expected).take(3)} only-batch=${(expected -- got).take(3)}")
      } finally q.stop()
    }
  }

  test("temporal enrich: multi-batch replay equals the batch interval join on a random SCD-2 dim") {
    // The stream-static as-of twin (q_stream_asof's shape): the SCD-2
    // validity dim is built from the SAME random events, then the events
    // replay in random micro-batches and each probes the dim for the
    // state valid at its timestamp. Stateless per micro-batch, so the
    // finished stream must equal the batch interval join row-for-row —
    // here fuzzed over random attribute-change patterns instead of the
    // bench's fixed table.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(81)
    for (trial <- 1 to 2) {
      val rows = randomEvents(rnd, 200).zipWithIndex
        .map { case (e, i) => (100L + i, e._2, e._1, e._3) } // (event_id, user, ts, type)
      val ev = rows.toDF("event_id", "user_id", "ts", "event_type")
      val dim = graft.ops.EventOps.scd2Intervals(
          ev, "user_id", "ts", "event_id", "event_type")
        .select(col("user_id").as("d_user"),
          col("event_type").as("state_type"),
          col("valid_from_ts"), col("valid_to_ts"))
      val expected = ev.join(dim,
          ev("user_id") === dim("d_user") &&
            ev("ts") >= dim("valid_from_ts") &&
            (dim("valid_to_ts").isNull || ev("ts") < dim("valid_to_ts")),
          "left")
        .select(col("event_id"), col("state_type"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val mem = MemoryStream[(Long, Long, Timestamp)]
      val enriched = StreamingOps.streamStaticTemporalEnrich(
          mem.toDF().toDF("event_id", "user_id", "ts"), dim,
          Seq("user_id" -> "d_user"), "ts", "valid_from_ts", "valid_to_ts")
        .select(col("event_id"), col("state_type"))
      val sink = s"twin_temporal_$trial"
      val q = enriched.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        randomBatches(rnd, rows.map(r => (r._1, r._2, r._3)))
          .foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val got = spark.table(sink).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got == expected,
          s"trial $trial: stream ${got.size} vs batch ${expected.size}")
      } finally q.stop()
    }
  }

  test("dedup: multi-batch replay key set equals the batch distinct on random events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(79)
    val rows = randomEvents(rnd, 300)
    val expected = rows.map(r => (r._2, r._3)).toSet
    val mem = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamingOps.streamingDedup(
      mem.toDF().toDF("ts", "user_id", "event_type"),
      keyCols = Seq("user_id", "event_type"), watermarkDelay = "365 days")
    val sink = "twin_dedup"
    val q = deduped.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      randomBatches(rnd, rows.map(r => (r._1, r._2, r._3)))
        .foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val got = spark.table(sink).select(col("user_id"), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expected)
    } finally q.stop()
  }
}
