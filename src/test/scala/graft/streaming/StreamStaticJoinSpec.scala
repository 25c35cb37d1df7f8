package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream-static join: an event stream enriched against a static
  * dimension — the standard shape for dimensioning an unbounded fact
  * stream (static side re-read per micro-batch; no state store needed).
  */
class StreamStaticJoinSpec extends SparkSpec {
  import spark.implicits._

  test("streaming events join a static dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")

    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
    val joined = events.join(dim, Seq("user_id"), "left")
      .groupBy(col("tier")).agg(round(sum(col("value")), 2).as("total"))

    val query = joined.writeStream.format("memory")
      .queryName("stream_static").outputMode("complete").start()
    try {
      mem.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 5.0),
        (1L, Timestamp.valueOf("2024-01-01 10:01:00"), 7.0),
        (2L, Timestamp.valueOf("2024-01-01 10:02:00"), 1.0),
        (9L, Timestamp.valueOf("2024-01-01 10:03:00"), 2.0))  // no dim row
      query.processAllAvailable()
      val out = spark.sql("select * from stream_static").collect()
        .map(r => (Option(r.getString(0)), r.getDouble(1))).toMap
      assert(out(Some("gold")) == 12.0)
      assert(out(Some("silver")) == 1.0)
      assert(out(None) == 2.0)
    } finally query.stop()
  }
}
