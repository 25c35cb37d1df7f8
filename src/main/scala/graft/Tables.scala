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

  /** Cheap content snapshot id of a table's backing files: a hash over
    * the recursive (path, length, mtime) listing — one filesystem
    * metadata pass, no Spark job, valid for any Hadoop-compatible store.
    * Used to key build-once artifacts (trained ANN quantizers) by DATA
    * identity instead of directory name, so an in-place rewrite of the
    * files can never serve a stale model (the memoizer contract becomes
    * structural, not conventional).
    *
    * The listing is collected and SORTED by full URI before folding:
    * `fs.listFiles` iteration order is not guaranteed stable across
    * Hadoop stores (a reordered listing of identical files must not
    * re-key the cache and force a spurious retrain). The full URI — not
    * just the basename — enters the hash, so a file moved between
    * subdirectories changes the id. Known caveat (deliberate, same as
    * every mtime-based cache): an in-place rewrite with IDENTICAL length
    * landing inside the SAME mtime tick on a coarse-mtime filesystem
    * (e.g. 1-2 s FAT/NFS granularity) keeps the id; parquet rewrites
    * virtually never preserve byte length, and the intended stores
    * (HDFS/S3/local ext4) carry ms-or-finer mtimes.
    */
  def snapshotId(spark: SparkSession, sfDir: String, table: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val st = it.next()
      entries += ((st.getPath.toUri.toString, st.getLen, st.getModificationTime))
    }
    var h = 1125899906842597L // deterministic FNV-ish fold over the sorted listing
    var bytes = 0L
    for ((p, len, mtime) <- entries.sortBy(_._1)) {
      bytes += len
      var i = 0
      while (i < p.length) { h = h * 31 + p.charAt(i); i += 1 }
      h = h * 31 + len
      h = h * 31 + mtime
    }
    s"${entries.size}:$bytes:${java.lang.Long.toHexString(h)}"
  }
}
