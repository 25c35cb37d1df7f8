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
}
