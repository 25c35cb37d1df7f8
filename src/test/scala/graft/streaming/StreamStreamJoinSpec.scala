package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream-stream interval join: clicks matched to purchases of the same
  * user within the preceding hour, both sides watermarked — the state
  * store retains only rows inside the interval+watermark horizon, which
  * is what bounds memory on an unbounded pair of streams.
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked interval join matches within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]

    val c = clicks.toDF().toDF("user_id", "ts").withWatermark("ts", "2 hours")
    val p = purchases.toDF().toDF("p_user", "p_ts", "amount")
      .withWatermark("p_ts", "2 hours")

    val joined = c.join(p,
      expr("""p_user = user_id AND
              p_ts BETWEEN ts - INTERVAL 1 HOUR AND ts"""))
      .select(col("user_id"), col("ts"), col("amount"))

    val query = joined.writeStream.format("memory")
      .queryName("stream_stream").outputMode("append").start()
    try {
      purchases.addData(
        (1L, Timestamp.valueOf("2024-01-01 09:30:00"), 50.0),   // within 1h of click
        (1L, Timestamp.valueOf("2024-01-01 07:00:00"), 99.0),   // too old
        (2L, Timestamp.valueOf("2024-01-01 09:45:00"), 10.0))   // other user
      clicks.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00")))
      query.processAllAvailable()
      val out = spark.sql("select * from stream_stream").collect()
      assert(out.length == 1)
      assert(out(0).getAs[Double]("amount") == 50.0)
    } finally query.stop()
  }

  test("left-outer interval join emits unmatched clicks after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = StreamingOps.streamingIntervalJoin(
        clicks.toDF().toDF("click_id", "user_id", "ts"),
        purchases.toDF().toDF("purchase_id", "p_user", "p_ts", "amount"),
        leftKey = "user_id", rightKey = "p_user", leftTs = "ts", rightTs = "p_ts",
        lookback = "1 hour", watermarkDelay = "1 minute", joinType = "leftOuter")
      .select(col("click_id"), col("purchase_id"), col("amount"))
    val query = joined.writeStream.format("memory")
      .queryName("stream_outer_spec").outputMode("append").start()
    try {
      purchases.addData((10L, 1L, Timestamp.valueOf("2024-01-01 09:30:00"), 50.0))
      clicks.addData(
        (100L, 1L, Timestamp.valueOf("2024-01-01 10:00:00")),  // matches purchase 10
        (200L, 2L, Timestamp.valueOf("2024-01-01 10:00:00")))  // no purchase → outer row
      query.processAllAvailable()
      // the matched row is out; the unmatched click is still held in state
      val early = spark.sql("select * from stream_outer_spec").collect()
      assert(early.map(_.getLong(0)).toSet == Set(100L))
      // ONE sentinel batch on both sides advances the min watermark; the
      // engine's no-data micro-batch then flushes the unmatched left row
      // (q_stream_outer relies on exactly this — pinned here).
      purchases.addData((-1L, -999L, Timestamp.valueOf("2024-06-01 00:00:00"), 0.0))
      clicks.addData((-1L, -998L, Timestamp.valueOf("2024-06-01 00:00:00")))
      query.processAllAvailable()
      val out = spark.sql("select * from stream_outer_spec")
        .filter(col("click_id") >= 0).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(out == Set((100L, 10L), (200L, -1L)),
        s"expected match + flushed outer row, got $out")
    } finally query.stop()
  }
}
