package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed event aggregation — one definition serving both batch and
  * Structured Streaming (the transformations are identical; only the
  * source/sink differ). The reference has no streaming at all
  * (SURVEY.md §2.10); this is the beyond-reference capability slice over
  * the `events` table.
  */
object StreamingOps {

  /** Tumbling-window counts/sums per event type. On a streaming input, call
    * `withWatermark("ts", …)` upstream and this plan runs incrementally
    * with state cleanup; on a batch input it is a plain hash aggregation.
    */
  def tumblingAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window aggregation (each event lands in width/slide windows). */
  def slidingAgg(events: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Streaming variant with watermarking — late data beyond the watermark
    * is dropped and window state is garbage-collected, which is what keeps
    * state bounded on an unbounded 100 TB/day stream.
    */
  def streamingTumblingAgg(events: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    tumblingAgg(events.withWatermark("ts", watermark), width)
}
