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
