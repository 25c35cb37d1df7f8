package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics: ordered-step funnels and cohort retention —
  * the two aggregate shapes every product-analytics workload runs over an
  * events table, expressed as equi-joins + hash aggregations so the plans
  * scale like any other keyed pipeline (no self-windows over raw events).
  */
object EventOps {

  /** Ordered-step funnel: step 1 is each user's first `steps(0)` event;
    * step k+1 is their first `steps(k)` event AT OR AFTER their step-k
    * time. Returns one row per step: (step_idx, step, n_users) — the
    * strictly-ordered "view → click → purchase" conversion counts, which
    * a naive per-type count overstates (events out of order don't
    * convert).
    *
    * Scale: each stage is filter → shuffle on user → min aggregation —
    * per-stage shuffle carries one (user, ts) pair per qualifying event;
    * the per-step counts are scalar aggregates. Stage k's frame is at
    * most the funnel survivors, so work shrinks monotonically.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col(typeCol) === step)
        .select(col(userCol).as("_fu"), col(tsCol).as("_fts"))
        .join(prev, col("_fu") === col("u") && col("_fts") >= col("t"))
        .groupBy(col("_fu"))
        .agg(min(col("_fts")).as("t"))
        .select(col("_fu").as("u"), col("t"))
    }
    stages.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step_idx"), lit(step).as("step"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by the calendar day of their first
    * event; for every (cohort day, day offset) the number of cohort
    * members active that many days later. The day-grain activity set is
    * deduplicated BEFORE the join, so the matrix aggregation sees one row
    * per (user, day), not per event.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val firstDay = events.groupBy(col(userCol).as("u"))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    val activity = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    activity.join(firstDay, "u")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("long").as("day_offset"), col("n_users"))
  }
}
