package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * All engine queries read through here: parquet scans get Catalyst's
  * filter pushdown + column pruning for free, and graft's native functions
  * are registered on first touch of a session.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    GraftFunctions.register(spark)
    // The events table carries TIMESTAMP(NANOS) — Spark 4 has no nanosecond
    // timestamp type, so read nanos as long and convert to microseconds
    // here (integer `div`, not double division: ns-epoch values overflow a
    // double's 53-bit mantissa).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Pin the session zone HERE, not just in the entry-point builders:
    // every main (Verify/Bench/Profile/ExplainAudit) and every spec loads
    // tables through this method, so the NTZ→timestamp cast below is
    // value-preserving regardless of the host's default timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    // nanosAsLong only rewrites TIMESTAMP(NANOS) columns; a regenerated
    // events table written at micro precision reads as TIMESTAMP_NTZ
    // instead — branch on the LOADED type, not the table name alone, and
    // normalize either form to the session-zone TIMESTAMP every operator
    // downstream (unix_micros, window, date_format) was built against.
    // The session zone is pinned UTC above, so the NTZ→LTZ cast is
    // value-preserving.
    if (table == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", df("ts").cast("timestamp"))
        case _ => df
      }
    else df
  }
}
