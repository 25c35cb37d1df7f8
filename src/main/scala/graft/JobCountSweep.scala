package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-count census over the whole registered query surface — the
  * companion to [[ProfileJobs]] (one query, per-job timeline). Under
  * ambient load every submitted job pays a scheduling quantum, so the
  * job COUNT — not idle wall — is what predicts a query's exposure to a
  * busy host (the r14 lesson: the three most driver-inflated queries
  * were exactly the highest-job-count ones). This sweep ranks all
  * queries by jobs-per-run so PlanContractSpec's budgets are pinned
  * from measurement, not guesses.
  *
  * Usage: runMain graft.JobCountSweep [sfDir] [filterPrefix]
  *
  * Prints one `name jobs wall_s` line per query, sorted by jobs
  * descending. Counting is made deterministic without listener-bus
  * internals: after each query a MARKER job is submitted and the sweep
  * waits for its JobStart to be delivered — the bus is FIFO, so every
  * earlier start has been counted by then. `wall_s` is captured BEFORE
  * the marker job (the census times the query, not the drain), and a
  * marker that fails to arrive within 30 s marks the row INCOMPLETE
  * instead of silently reporting a possibly-short count (ADVICE r15).
  *
  * When `SPARK_GRAFT_JOBS_OUT` is set, the census is also written there
  * as JSON sorted by query name — a committed, round-over-round diffable
  * artifact (JOBS.json) for the job-count budgets in PlanContractSpec,
  * the same role bench_queries.json plays for wall time (verdict r15
  * item #5).
  */
object JobCountSweep {
  val MarkerDesc = "__graft_job_count_marker__"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefix = args.lift(1).getOrElse("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    val results =
      scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double, Boolean)]
    // Queries that threw are recorded, not just logged (ADVICE r16: a
    // failed query silently shrank the committed census — format_jobs.py
    // refuses "failed" rows the same way it refuses INCOMPLETE ones).
    val failedQueries = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if name.startsWith(prefix)) {
      def run(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // A query whose MEASUREMENT completed but whose post-run cleanup
      // threw must not also land in failedQueries (ADVICE r17: it would
      // emit a duplicate JSON key and double-count n_queries).
      var measured = false
      try {
        run() // warm-up: one-time memoizer/JIT jobs land outside the count
        spark.catalog.clearCache()
        sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        val n = new java.util.concurrent.atomic.AtomicInteger
        val marker = new java.util.concurrent.CountDownLatch(1)
        val l = new SparkListener {
          override def onJobStart(js: SparkListenerJobStart): Unit = {
            val desc = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
            if (desc.contains(MarkerDesc)) marker.countDown()
            else { n.incrementAndGet(); () }
          }
        }
        sc.addSparkListener(l)
        val t0 = System.nanoTime()
        var drained = false
        try {
          run()
          val wall = (System.nanoTime() - t0) / 1e9 // before the marker job
          sc.setJobDescription(MarkerDesc)
          try sc.parallelize(1 to 1, 1).count()
          finally sc.setJobDescription(null)
          drained = marker.await(30, java.util.concurrent.TimeUnit.SECONDS)
          results += ((name, n.get, wall, !drained))
          measured = true
        } finally sc.removeSparkListener(l)
        spark.catalog.clearCache()
        sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      } catch {
        case e: Throwable =>
          if (!measured) failedQueries += name
          System.err.println(s"SWEEP $name failed: $e")
      }
    }
    results.sortBy(-_._2).foreach { case (name, jobs, wall, incomplete) =>
      val note = if (incomplete) "  INCOMPLETE" else ""
      println(f"$name%-32s $jobs%4d jobs  $wall%6.2fs$note")
    }
    failedQueries.foreach(n => println(f"$n%-32s FAILED"))
    println(s"TOTAL queries=${results.size} jobs=${results.map(_._2).sum}" +
      (if (results.exists(_._4)) " (INCOMPLETE rows present)" else "") +
      (if (failedQueries.nonEmpty)
         s" (FAILED: ${failedQueries.mkString(", ")})" else ""))
    sys.env.get("SPARK_GRAFT_JOBS_OUT").foreach { out =>
      val rows = results.map { case (name, jobs, _, incomplete) =>
        name -> s"""{"jobs":$jobs${if (incomplete) ",\"incomplete\":true" else ""}}"""
      } ++ failedQueries.map(n => n -> """{"failed":true}""")
      val body = rows.sortBy(_._1)
        .map { case (n, v) => s""""$n":$v""" }.mkString("{", ",", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (s"""{"sf":"$sfDir","cpus":"$cpus","n_queries":${rows.size},""" +
          s""""total_jobs":${results.map(_._2).sum},"queries":$body}""" + "\n")
          .getBytes("UTF-8"))
      ()
    }
    spark.stop()
  }
}
