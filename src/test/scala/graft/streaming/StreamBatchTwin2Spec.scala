package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import scala.util.Random

/** Stream/batch twin differential, part 2 (r16): the four replay shapes
  * StreamBatchTwinSpec does not cover — the stream-stream OUTER join
  * matrix (left-outer and full-outer, whose null-padded rows only flush
  * once the watermark passes each row's join window), the built-in
  * `session_window` aggregation, and the windowed-HLL distinct — each
  * fuzzed on RANDOM event sets replayed at RANDOM micro-batch boundaries
  * against the identical batch computation.
  *
  * Outer-join replay contract (same as q_stream_outer /
  * q_stream_full_outer in SparkEntry): both sides replay in event-time
  * order, so the global watermark — the MIN across the two inputs —
  * always lags every future arrival and nothing is late-dropped; a
  * far-future sentinel on BOTH sides then advances the watermark past the
  * data so every unmatched row flushes before the sink read. Sentinel
  * keys are negative and match nothing real; they surface as unmatched
  * singles and are filtered out. Under that contract the finished stream
  * must equal the batch join with the SAME range condition, exactly —
  * which is what these twins assert on random inputs, including
  * cross-batch pairs (a click in batch k matching a purchase from batch
  * j<k out of recovered state) that the single-batch bench replays
  * deliberately skip.
  */
class StreamBatchTwin2Spec extends SparkSpec {
  import spark.implicits._

  /** Random ts-sorted clicks: (click_id, user_id, ts) over a ~6 h span. */
  private def randomClicks(rnd: Random, n: Int): Seq[(Long, Long, Timestamp)] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (1 to n).map { i =>
      val t = base + rnd.nextInt(6 * 3600) * 1000L + rnd.nextInt(1000)
      (i.toLong, rnd.nextInt(6).toLong, new Timestamp(t))
    }.sortBy(_._3.getTime)
  }

  /** Random ts-sorted purchases: (purchase_id, user_id, ts, amount). */
  private def randomPurchases(rnd: Random, n: Int): Seq[(Long, Long, Timestamp, Double)] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (1 to n).map { i =>
      val t = base + rnd.nextInt(6 * 3600) * 1000L + rnd.nextInt(1000)
      (i.toLong, rnd.nextInt(6).toLong, new Timestamp(t), rnd.nextInt(10000) / 100.0)
    }.sortBy(_._3.getTime)
  }

  /** Split into 1..4 batches at random cut points (order preserved). */
  private def randomBatches[T](rnd: Random, rows: Seq[T]): Seq[Seq[T]] = {
    val k = 1 + rnd.nextInt(4)
    val cuts = (Seq(0, rows.size) ++ (1 until k).map(_ => rnd.nextInt(rows.size + 1)))
      .sorted.distinct
    cuts.zip(cuts.tail).map { case (a, b) => rows.slice(a, b) }.filter(_.nonEmpty)
  }

  /** Normalize a (click_id, purchase_id, amount) result to a sorted,
    * null-explicit multiset for exact comparison.
    */
  private def normalize(df: DataFrame): Vector[String] =
    df.collect().map { r =>
      val c = if (r.isNullAt(0)) "null" else r.getLong(0).toString
      val p = if (r.isNullAt(1)) "null" else r.getLong(1).toString
      val a = if (r.isNullAt(2)) "null" else r.getDouble(2).toString
      s"$c|$p|$a"
    }.toVector.sorted

  /** Run one randomized outer-join twin trial for the given join type. */
  private def outerJoinTrial(rnd: Random, joinType: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val clickRows = randomClicks(rnd, 80 + rnd.nextInt(60))
    val purchRows = randomPurchases(rnd, 100 + rnd.nextInt(60))

    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = StreamingOps.streamingIntervalJoin(
        clicks.toDF().toDF("click_id", "user_id", "ts"),
        purchases.toDF().toDF("purchase_id", "p_user", "p_ts", "amount"),
        leftKey = "user_id", rightKey = "p_user", leftTs = "ts", rightTs = "p_ts",
        lookback = "1 hour", watermarkDelay = "2 hours", joinType = joinType)
      .select(col("click_id"), col("purchase_id"), col("amount"))
    val sink = s"twin2_${joinType}_sink_${rnd.nextInt(1 << 30)}"
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      // Alternate random per-side batches so cross-batch state is hit;
      // per-side event-time order keeps every arrival ahead of the
      // watermark (see class doc).
      val cb = randomBatches(rnd, clickRows)
      val pb = randomBatches(rnd, purchRows)
      (0 until math.max(cb.size, pb.size)).foreach { i =>
        if (i < pb.size) { purchases.addData(pb(i): _*); q.processAllAvailable() }
        if (i < cb.size) { clicks.addData(cb(i): _*); q.processAllAvailable() }
      }
      val future = new Timestamp(
        Timestamp.valueOf("2024-01-10 00:00:00").getTime)
      purchases.addData((-1L, -999L, future, 0.0))
      clicks.addData((-1L, -998L, future))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = normalize(
      spark.table(sink).filter(
        coalesce(col("click_id"), lit(0L)) >= 0 &&
        coalesce(col("purchase_id"), lit(0L)) >= 0))

    val batchJoinType = if (joinType == "leftOuter") "left_outer" else "full_outer"
    val expected = normalize(
      clickRows.toDF("click_id", "user_id", "ts").join(
          purchRows.toDF("purchase_id", "p_user", "p_ts", "amount"),
          expr("p_user = user_id AND p_ts BETWEEN ts - INTERVAL 1 hour AND ts"),
          batchJoinType)
        .select(col("click_id"), col("purchase_id"), col("amount")))

    assert(streamed == expected,
      s"$joinType twin mismatch: streamed ${streamed.size} rows vs batch " +
        s"${expected.size}; first diffs: " +
        s"${(streamed.diff(expected) ++ expected.diff(streamed)).take(5)}")
  }

  test("left-outer interval join: multi-batch replay equals the batch twin on random events") {
    val rnd = new Random(161)
    for (_ <- 1 to 2) outerJoinTrial(rnd, "leftOuter")
  }

  test("full-outer interval join: multi-batch replay equals the batch twin on random events") {
    val rnd = new Random(162)
    for (_ <- 1 to 2) outerJoinTrial(rnd, "fullOuter")
  }

  test("session_window agg: multi-batch replay equals the batch twin on random events") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(163)
    for (trial <- 1 to 2) {
      // Tight span + small user pool so gaps both merge and split.
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = (1 to 150 + 50 * trial).map { _ =>
        val t = base + rnd.nextInt(4 * 3600) * 1000L + rnd.nextInt(1000)
        (rnd.nextInt(4).toLong, new Timestamp(t), rnd.nextInt(1000) / 100.0)
      }.sortBy(_._2.getTime)

      def sessions(df: DataFrame): DataFrame = df
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sv"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("sv"))

      val mem = MemoryStream[(Long, Timestamp, Double)]
      val src = mem.toDF().toDF("user_id", "ts", "value")
        .withWatermark("ts", "30 minutes")
      val sink = s"twin2_session_sink_$trial"
      val q = sessions(src).writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        randomBatches(rnd, rows).foreach { b =>
          mem.addData(b: _*); q.processAllAvailable()
        }
        mem.addData((-1L, new Timestamp(base + 100L * 86400000L), 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(sink).filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
        .toVector.sorted
      val expected = sessions(rows.toDF("user_id", "ts", "value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
        .toVector.sorted
      assert(streamed == expected,
        s"session twin mismatch (trial $trial): ${streamed.size} vs ${expected.size}")
    }
  }

  test("windowed HLL distinct: random out-of-order batch splits equal the batch registers") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(164)
    for (trial <- 1 to 2) {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = (1 to 300).map { _ =>
        val t = base + rnd.nextInt(3 * 3600) * 1000L
        (new Timestamp(t), rnd.nextInt(200).toLong)
      }
      val mem = MemoryStream[(Timestamp, Long)]
      val regs = StreamingOps.streamingWindowedDistinct(
        mem.toDF().toDF("ts", "user_id"), "ts", "user_id",
        width = "1 hour", watermark = "4 hours")
      val sink = s"twin2_hll_sink_$trial"
      val q = regs.writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try {
        // max() is idempotent/commutative: ANY split, in ANY order, with
        // duplicated rows, must converge to the batch registers.
        val shuffled = rnd.shuffle(rows)
        randomBatches(rnd, shuffled).foreach { b =>
          mem.addData(b: _*); q.processAllAvailable()
        }
        mem.addData(shuffled.take(1 + rnd.nextInt(50)): _*) // at-least-once replay
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(sink)
        .collect().map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2)))
        .toVector.sorted
      val expected = graft.sketch.Sketches.hllRegisters(
          rows.toDF("ts", "user_id")
            .withColumn("window_start", date_trunc("hour", col("ts"))),
          Seq("window_start"), "user_id")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2)))
        .toVector.sorted
      assert(streamed == expected,
        s"HLL twin mismatch (trial $trial): ${streamed.size} vs ${expected.size}")
    }
  }
}
