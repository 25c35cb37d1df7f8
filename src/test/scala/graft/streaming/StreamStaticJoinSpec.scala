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

  test("streamStaticEnrich is stateless: no state operators, equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0L, "even"), (1L, "odd")).toDF("k", "parity")
    val mem = MemoryStream[(Long, Long)]
    val enriched = StreamingOps.streamStaticEnrich(
      mem.toDF().toDF("id", "v").withColumn("k", col("v") % 2),
      dim, Seq("k"))
    val query = enriched.writeStream.format("memory")
      .queryName("stream_static_enrich").outputMode("append").start()
    try {
      mem.addData((1L, 10L), (2L, 11L)); query.processAllAvailable()
      mem.addData((3L, 12L)); query.processAllAvailable()
      // append mode with no watermark only works because the join keeps
      // NO state — pinned directly on the progress metrics
      assert(query.lastProgress.stateOperators.isEmpty,
        "stream-static join must not create a state store")
      val out = spark.sql("select id, parity from stream_static_enrich")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == Map(1L -> "even", 2L -> "odd", 3L -> "even"))
    } finally query.stop()
  }

  test("streamStaticTemporalEnrich: interval probe, half-open bounds, stateless") {
    implicit val sqlCtx = spark.sqlContext
    // user 1's state history: [10:00, 11:00) = "a", [11:00, ∞) = "b"
    val dim = Seq(
      (1L, "a", Timestamp.valueOf("2024-01-01 10:00:00"),
        Some(Timestamp.valueOf("2024-01-01 11:00:00"))),
      (1L, "b", Timestamp.valueOf("2024-01-01 11:00:00"),
        None.asInstanceOf[Option[Timestamp]]))
      .toDF("d_user", "state", "vf", "vt")
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val enriched = StreamingOps.streamStaticTemporalEnrich(
        mem.toDF().toDF("id", "user_id", "ts"), dim,
        Seq("user_id" -> "d_user"), "ts", "vf", "vt")
      .select(col("id"), col("state"))
    val query = enriched.writeStream.format("memory")
      .queryName("stream_temporal_enrich").outputMode("append").start()
    try {
      mem.addData(
        (1L, 1L, Timestamp.valueOf("2024-01-01 10:30:00")),  // inside [10,11) → a
        (2L, 1L, Timestamp.valueOf("2024-01-01 11:00:00")),  // AT the bound → b
        (3L, 1L, Timestamp.valueOf("2024-01-01 09:00:00")),  // before history → null
        (4L, 2L, Timestamp.valueOf("2024-01-01 10:30:00")))  // unknown key → null
      query.processAllAvailable()
      mem.addData((5L, 1L, Timestamp.valueOf("2024-01-01 23:00:00"))) // open interval
      query.processAllAvailable()
      assert(query.lastProgress.stateOperators.isEmpty,
        "temporal stream-static join must not create a state store")
      val out = spark.sql("select id, state from stream_temporal_enrich")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(out == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None,
        4L -> None, 5L -> Some("b")))
    } finally query.stop()
  }
}
