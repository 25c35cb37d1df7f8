package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level timeline for one query — the attribution companion to
  * [[Profile]] (which times whole queries). Iterative operators spend
  * their budget on many small JOBS (checkpoint materializations, counts,
  * per-iteration half-steps); knowing which job eats the wall is the
  * difference between optimizing a prologue and chasing noise.
  *
  * Usage: runMain graft.ProfileJobs <sfDir> <queryName> [warmRuns]
  *
  * Prints one line per Spark job of the FINAL (timed) run: start offset,
  * duration, and the job's call site, then the total.
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q_hits")
    val warm = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same A/B conf passthrough as Bench
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").map(_.trim)
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    val fn = SparkEntry.queries(name)
    for (_ <- 1 to warm) {
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"warm-up failed: $e") }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
    val markerDesc = "__graft_profile_jobs_marker__"
    val markerId = new java.util.concurrent.atomic.AtomicInteger(-1)
    val markerEnded = new java.util.concurrent.CountDownLatch(1)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        if (desc.contains(markerDesc)) { markerId.set(js.jobId); () }
        else {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            // callSite is absent under forked runMain; the job's LAST
            // stage name (the result stage) attributes it instead
            .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
            .getOrElse("?")
          jobs.put(js.jobId, (js.time, site))
          ()
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        if (je.jobId == markerId.get) markerEnded.countDown()
        else Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.synchronized { done += ((je.jobId, t0, je.time - t0, site)) }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // Deterministic drain (no fixed sleep): a MARKER job runs after the
    // timed query; the listener bus is FIFO, so once the marker's
    // JobEnd is delivered every earlier start/end has been too. A
    // timed-out drain means the table below may be missing tail jobs —
    // say so instead of printing a silently-short profile (the same
    // fix JobCountSweep got, ADVICE r15).
    spark.sparkContext.setJobDescription(markerDesc)
    try spark.sparkContext.parallelize(1 to 1, 1).count()
    finally spark.sparkContext.setJobDescription(null)
    if (!markerEnded.await(10, java.util.concurrent.TimeUnit.SECONDS))
      println("WARNING: listener bus did not drain within 10 s — " +
        "the job table below may be INCOMPLETE")
    val sorted = done.synchronized(done.sortBy(_._2)).toSeq
    val base = sorted.headOption.map(_._2).getOrElse(0L)
    sorted.foreach { case (id, st, dur, site) =>
      println(f"JOB $id%3d +${(st - base) / 1000.0}%7.2fs ${dur / 1000.0}%6.2fs  $site")
    }
    println(f"TOTAL jobs=${sorted.size} jobtime=${sorted.map(_._3).sum / 1000.0}%.2fs wall=$wall%.2fs")
    spark.stop()
  }
}
