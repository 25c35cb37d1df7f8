package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files
import java.sql.Timestamp

/** Checkpoint recovery — the property a real cluster exercises weekly:
  * stop a checkpointed stateful query mid-stream, start a NEW query from
  * the same checkpoint, and the recovered state must behave exactly as if
  * the query had never stopped (no lost state, no re-emitted output).
  * The in-flight specs in StreamingOpsSpec replay within one query; these
  * cross a stop/start boundary. The sink is the parquet FILE sink — the
  * memory sink is not fault-tolerant and refuses checkpoint recovery, so
  * this also exercises the exactly-once _spark_metadata commit log that a
  * production file sink relies on.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("sessionize state survives a stop/restart: pre-restart events close post-restart") {
    implicit val sqlCtx = spark.sqlContext
    val cp = Files.createTempDirectory("graft_cp_sessions").toString
    val out = Files.createTempDirectory("graft_out_sessions").toString
    val mem = MemoryStream[StreamingOps.SessionInput]
    def startQuery() =
      StreamingOps.streamingSessionize(
          mem.toDS(), gapSeconds = 1800, watermarkDelay = "0 seconds")
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append").start()

    // Open a session (2 events, still inside the gap), commit, STOP.
    val q1 = startQuery()
    try {
      mem.addData(
        StreamingOps.SessionInput(1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
        StreamingOps.SessionInput(1L, Timestamp.valueOf("2024-01-01 00:10:00"), 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(out).isEmpty, "session must still be open at shutdown")

    // Restart from the checkpoint; an event past the gap must close the
    // session built BEFORE the restart — provable only if the
    // flatMapGroupsWithState state store was recovered.
    val q2 = startQuery()
    try {
      mem.addData(
        StreamingOps.SessionInput(1L, Timestamp.valueOf("2024-01-01 02:00:00"), 4.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val sessions = spark.read.parquet(out).collect()
    assert(sessions.length == 1,
      s"expected exactly one recovered session, got ${sessions.length}")
    assert(sessions(0).getAs[Long]("n_events") == 2)
    assert(sessions(0).getAs[Double]("session_value") == 3.0)
    assert(sessions(0).getAs[Timestamp]("session_start") ==
      Timestamp.valueOf("2024-01-01 00:00:00"))
  }

  test("tumbling-agg window state survives a restart at a random batch boundary: " +
      "full output equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // Third state-store shape under restart (sessionize covers
    // flatMapGroupsWithState, dedup covers the dropDuplicates store):
    // PARTIAL WINDOW AGGREGATES — counts/sums for windows the watermark
    // has not yet finalized must be recovered, or post-restart events
    // landing in a pre-restart window would double-count or reset.
    // Randomized: random events, random micro-batch cuts, restart at a
    // random boundary, final answer compared to the batch twin.
    val rnd = new scala.util.Random(165)
    val types = Seq("click", "view", "purchase")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (1 to 250).map { _ =>
      val t = base + rnd.nextInt(5 * 3600) * 1000L + rnd.nextInt(1000)
      (new Timestamp(t), types(rnd.nextInt(types.length)), rnd.nextInt(1000) / 100.0)
    }.sortBy(_._1.getTime)
    // 3..5 batches, restart after a random non-final batch.
    val k = 3 + rnd.nextInt(3)
    val cuts = (Seq(0, rows.size) ++ (1 until k).map(_ => rnd.nextInt(rows.size + 1)))
      .sorted.distinct
    val batches = cuts.zip(cuts.tail).map { case (a, b) => rows.slice(a, b) }
      .filter(_.nonEmpty)
    val restartAfter = // 0-based index of the last pre-restart batch
      if (batches.size > 1) rnd.nextInt(batches.size - 1) else 0

    val cp = Files.createTempDirectory("graft_cp_tumbling").toString
    val out = Files.createTempDirectory("graft_out_tumbling").toString
    val mem = MemoryStream[(Timestamp, String, Double)]
    def startQuery() =
      StreamingOps.streamingTumblingAgg(
          mem.toDF().toDF("ts", "event_type", "value"),
          width = "1 hour", watermark = "30 minutes")
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append").start()

    val q1 = startQuery()
    try {
      batches.take(restartAfter + 1).foreach { b =>
        mem.addData(b: _*); q1.processAllAvailable()
      }
    } finally q1.stop()
    val q2 = startQuery()
    try {
      batches.drop(restartAfter + 1).foreach { b =>
        mem.addData(b: _*); q2.processAllAvailable()
      }
      // Far-future sentinel flushes every open window; filtered below.
      mem.addData((new Timestamp(base + 100L * 86400000L), "zz_sentinel", 0.0))
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = spark.read.parquet(out)
      .filter($"event_type" =!= "zz_sentinel")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .toVector.sorted
    val expected = StreamingOps.tumblingAgg(
        rows.toDF("ts", "event_type", "value"), width = "1 hour")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .toVector.sorted
    assert(streamed == expected,
      s"restart twin mismatch: ${streamed.size} vs ${expected.size} rows " +
        s"(restart after batch $restartAfter of ${batches.size})")
  }

  test("stream-stream join state survives a restart at a random batch boundary: " +
      "full output equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // Fourth state-store shape under restart: the stream-stream JOIN
    // buffers — both sides' unmatched rows must survive the stop/start
    // (a purchase buffered pre-restart must still match a click arriving
    // post-restart), and the recovered watermark must keep null-padded
    // full-outer rows correct. Randomized like the tumbling-agg test:
    // random events, random per-side cuts, restart at a random point in
    // the interleaved feed, final answer vs the batch full-outer join.
    val rnd = new scala.util.Random(166)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def randTs() = new Timestamp(base + rnd.nextInt(6 * 3600) * 1000L + rnd.nextInt(1000))
    val clickRows = (1 to 90).map(i => (i.toLong, rnd.nextInt(6).toLong, randTs()))
      .sortBy(_._3.getTime)
    val purchRows = (1 to 110).map(i =>
        (i.toLong, rnd.nextInt(6).toLong, randTs(), rnd.nextInt(10000) / 100.0))
      .sortBy(_._3.getTime)
    def cutBatches[T](rows: Seq[T]): Seq[Seq[T]] = {
      val k = 2 + rnd.nextInt(3)
      val cuts = (Seq(0, rows.size) ++ (1 until k).map(_ => rnd.nextInt(rows.size + 1)))
        .sorted.distinct
      cuts.zip(cuts.tail).map { case (a, b) => rows.slice(a, b) }.filter(_.nonEmpty)
    }
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp, Double)]
    // Interleaved feed plan (purchase batch, click batch, …): per-side
    // event-time order is preserved, so the MIN-across-inputs watermark
    // lags every future arrival; alternating sides makes both buffers
    // hold pre-restart rows that must match post-restart arrivals.
    val pb = cutBatches(purchRows).map(b => () => { purchases.addData(b: _*); () })
    val cb = cutBatches(clickRows).map(b => () => { clicks.addData(b: _*); () })
    val plan: Seq[() => Unit] =
      (0 until math.max(pb.size, cb.size)).flatMap(i => pb.lift(i).toSeq ++ cb.lift(i).toSeq)
    val restartAt = 1 + rnd.nextInt(plan.size - 1)

    val cp = Files.createTempDirectory("graft_cp_ssjoin").toString
    val out = Files.createTempDirectory("graft_out_ssjoin").toString
    def startQuery() =
      StreamingOps.streamingIntervalJoin(
          clicks.toDF().toDF("click_id", "user_id", "ts"),
          purchases.toDF().toDF("purchase_id", "p_user", "p_ts", "amount"),
          leftKey = "user_id", rightKey = "p_user", leftTs = "ts", rightTs = "p_ts",
          lookback = "1 hour", watermarkDelay = "2 hours", joinType = "fullOuter")
        .select(col("click_id"), col("purchase_id"), col("amount"))
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append").start()

    val q1 = startQuery()
    try {
      plan.take(restartAt).foreach { step => step(); q1.processAllAvailable() }
    } finally q1.stop()
    val q2 = startQuery()
    try {
      plan.drop(restartAt).foreach { step => step(); q2.processAllAvailable() }
      val future = new Timestamp(base + 100L * 86400000L)
      purchases.addData((-1L, -999L, future, 0.0))
      clicks.addData((-1L, -998L, future))
      q2.processAllAvailable()
    } finally q2.stop()

    def normalize(rows: Array[org.apache.spark.sql.Row]): Vector[String] =
      rows.map { r =>
        val c = if (r.isNullAt(0)) "null" else r.getLong(0).toString
        val p = if (r.isNullAt(1)) "null" else r.getLong(1).toString
        val a = if (r.isNullAt(2)) "null" else r.getDouble(2).toString
        s"$c|$p|$a"
      }.toVector.sorted
    val streamed = normalize(spark.read.parquet(out)
      .filter(coalesce($"click_id", lit(0L)) >= 0 &&
        coalesce($"purchase_id", lit(0L)) >= 0)
      .collect())
    val expected = normalize(
      clickRows.toDF("click_id", "user_id", "ts").join(
          purchRows.toDF("purchase_id", "p_user", "p_ts", "amount"),
          expr("p_user = user_id AND p_ts BETWEEN ts - INTERVAL 1 hour AND ts"),
          "full_outer")
        .select($"click_id", $"purchase_id", $"amount")
        .collect())
    assert(streamed == expected,
      s"restart join twin mismatch: ${streamed.size} vs ${expected.size} rows " +
        s"(restart at step $restartAt of ${plan.size}); first diffs: " +
        s"${(streamed.diff(expected) ++ expected.diff(streamed)).take(5)}")
  }

  test("dedup state survives a stop/restart: resumed output still matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val cp = Files.createTempDirectory("graft_cp_dedup").toString
    val out = Files.createTempDirectory("graft_out_dedup").toString
    val mem = MemoryStream[(Timestamp, Long, String)]
    def startQuery() =
      StreamingOps.streamingDedup(
          mem.toDF().toDF("ts", "event_id", "payload"),
          keyCols = Seq("event_id"), watermarkDelay = "1 hour")
        .writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append").start()

    val batch1 = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "first"),
      (Timestamp.valueOf("2024-01-01 10:01:00"), 2L, "other"))
    val batch2 = Seq( // a dup of key 1 inside the horizon, plus a new key
      (Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "dup-after-restart"),
      (Timestamp.valueOf("2024-01-01 10:06:00"), 3L, "third"))

    val q1 = startQuery()
    try { mem.addData(batch1: _*); q1.processAllAvailable() } finally q1.stop()
    val preRestart = spark.read.parquet(out)
      .select($"event_id", $"payload").as[(Long, String)].collect().toSet

    val q2 = startQuery()
    try { mem.addData(batch2: _*); q2.processAllAvailable() } finally q2.stop()
    val all = spark.read.parquet(out)
      .select($"event_id", $"payload").as[(Long, String)].collect().toSet

    // Key 1's dup must be suppressed by RECOVERED state; committed
    // pre-restart output must not re-emit.
    assert(all -- preRestart == Set((3L, "third")),
      s"resumed emissions: ${all -- preRestart}")

    // Union of both runs' emissions == the batch answer over the full
    // input (first occurrence per key wins).
    val batchOracle = (batch1 ++ batch2).toDF("ts", "event_id", "payload")
      .groupBy($"event_id")
      .agg(org.apache.spark.sql.functions.min_by($"payload", $"ts").as("payload"))
      .as[(Long, String)].collect().toSet
    assert(all == batchOracle, s"streamed $all vs batch $batchOracle")
  }
}
