package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Each query is timed RUNS times and the minimum is reported: host
    // contention (other processes on the bench box) inflates individual
    // runs uniformly, and min-of-3 recovers the uncontended time — round 4
    // recorded a 1.9x "slowdown" that an idle-host re-run disproved.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k=v;k2=v2" — extra session confs for A/B
    // experiments (e.g. spark.graft.iterLoopAqe=session) without a
    // recompile; the driver never sets it.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").map(_.trim)
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    // Untimed warm-up, two layers:
    //  (1) a tiny count over EVERY test table — Hadoop-FS init, parquet
    //      footer reads, and scan codegen otherwise land on whichever
    //      query first touches that table (q1_pricing_summary sorts first
    //      and paid lineitem's warm-up in rounds 1-4);
    //  (2) the flagship `entry` plan, which exercises the agg/window
    //      codegen paths end to end.
    for (tbl <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$tbl.parquet").count()
      catch { case _: Throwable => () }
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Fixed name order: Map iteration order shifts when entries are added,
    // which silently reshuffles which queries pay residual warm-up — sorted
    // execution keeps per-query timings comparable across rounds.
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts to named queries — a dev
    // loop for targeted optimization; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Ambient-state calibration probe (verdict r17 item #3): the box
    // alternates between a ~182-187 s low state and a ~203-210 s high
    // state on identical code (NOTES r17, eight recorded passes), and
    // until now the classification lived in narrative. One fixed cheap
    // query (q_trim_all — one scan + projection, floor 0.116-0.136 s in
    // the committed width-32 r17 artifact) is timed at pass START,
    // MIDDLE, and END; the triple rides in both the sidecar and the
    // headline line, and a pass whose calibration MEDIAN exceeds the
    // known floor by >1.5x labels ITSELF high_state in the JSON
    // (rising_runs.py exposes it as an exit-code bit). Median, not min:
    // min-of-3 is exactly the statistic that hides sustained contention.
    val calibName = sys.env.getOrElse("SPARK_GRAFT_CALIB_QUERY", "q_trim_all")
    val calibFloor =
      sys.env.getOrElse("SPARK_GRAFT_CALIB_FLOOR", "0.13").toDouble
    val calibFn = SparkEntry.queries.get(calibName)
    val calibRuns = scala.collection.mutable.ArrayBuffer.empty[Double]
    def calibProbe(): Unit = calibFn.foreach { fn =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        calibRuns += (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => () }
    }
    // untimed warm-up of the calibration plan itself, so probe #1 is not
    // the one paying its codegen/JIT and flagging a false high state
    calibFn.foreach(fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () })
    // Contention/GC sidecar: the r12 driver artifact inflated 12
    // code-unchanged queries 3-10x and only a three-way git comparison
    // diagnosed it as host load. Recording the 1-minute loadavg and the
    // JVM GC-time delta PER RUN makes a loaded-box artifact readable at a
    // glance (load >> cores, or gc_ms ~ run wall) without touching what
    // is timed.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    // Locale-pinned 2-decimal format: f"..%.2f" uses the default JVM
    // locale, which on a comma-decimal locale emits "0,52" — invalid JSON
    // (ADVICE r13).
    def fmt2(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    // RDD-LEVEL blocks persisted BEFORE the timed loop (localCheckpoint
    // frames from warm-up) survive the per-run sweep — the sweep must only
    // evict what a query run itself left behind (ADVICE r12). Scope note
    // (ADVICE r13): this exemption covers RDD-level persists ONLY; the
    // clearCache() below still evicts every CacheManager (DataFrame-level)
    // entry each run, so a shared warm DataFrame cache would be recomputed
    // inside every timed run — don't rely on it being spared. The memoized
    // DataFrames that exist today (supplyPairs, coPairs) lose their cache
    // entry at the first sweep and run UNCACHED from then on; operators
    // that read such a relation more than once per run persist their own
    // local copy (e.g. GraphOps persists its edge relation), which is the
    // measured status quo.
    val baselineRdds = spark.sparkContext.getPersistentRDDs.keySet
    calibProbe() // pass START
    val calibMidIdx = selected.size / 2
    val timings = selected.zipWithIndex.map { case ((name, fn), qIdx) =>
      if (qIdx == calibMidIdx && qIdx > 0) calibProbe() // pass MIDDLE
      var failed = false
      var i = 0
      val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
      val loads = scala.collection.mutable.ArrayBuffer.empty[Double]
      val gcs = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (i < runs && !failed) {
        val load0 = loadAvg()
        val gc0 = gcMillis()
        val t0 = System.nanoTime()
        // noop sink forces full materialization of every output column —
        // count() alone lets Catalyst prune the projections under test.
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
            // A crash on ANY run marks the query failed — an intermittent
            // crasher must not report its fastest good run as comparable.
            failed = true
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (!failed) { ts += dt; loads += load0; gcs += gcMillis() - gc0 }
        // Drop blocks persisted inside operators (dedup/similarity reuse
        // frames) so runs don't inherit each other's storage pressure.
        spark.catalog.clearCache()
        // clearCache only empties the CacheManager (DataFrame persists);
        // eager localCheckpoint frames returned by iterative graph ops
        // register RDD-level blocks that survive it and accumulate across
        // 271 queries x 3 runs — the round-11 "run-3 tail" suspect.
        // blocking: the async form can leave blocks alive into the next
        // timed run (the residual run-3 tail after the round-12 fix).
        spark.sparkContext.getPersistentRDDs
          .foreach { case (id, rdd) =>
            if (!baselineRdds.contains(id)) rdd.unpersist(blocking = true) }
        if (sys.env.contains("SPARK_GRAFT_BENCH_GC")) System.gc()
        i += 1
      }
      // runs stay sorted for min/median; loads/gcs keep ARRIVAL order (run
      // i's load/gc pairs with runs_raw[i], not with the sorted runs list)
      (name, failed, ts.toSeq.sorted, ts.toSeq, loads.toSeq, gcs.toSeq)
    }
    calibProbe() // pass END
    // median of the probe triple vs the known floor; -1 when the probe
    // query is deselected/failed (never on the driver's full pass)
    val calibMed =
      if (calibRuns.isEmpty) -1.0
      else calibRuns.toSeq.sorted.apply(calibRuns.size / 2)
    val highState = calibMed > 1.5 * calibFloor
    val calibJson =
      s"""{"query":"$calibName","floor":$calibFloor,""" +
        s""""runs":[${calibRuns.mkString(",")}],"median":$calibMed,""" +
        s""""high_state":$highState}"""
    // A crashed query must not look like a fast one: report -1.
    val results = timings.map { case (name, failed, ts, _, _, _) =>
      name -> (if (failed) -1.0 else ts.head)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val anyFailed = results.exists(_._2 < 0)
    // A run with failures must not report a comparable total — a crashing
    // build would otherwise rank faster than a slower all-pass one.
    val total =
      if (anyFailed) "null"
      else if (results.nonEmpty) results.map(_._2).sum.toString
      else "0.0"
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val allLoads = timings.flatMap(_._5).filter(_ >= 0).sorted
    val loadMed =
      if (allLoads.isEmpty) "null" else fmt2(allLoads(allLoads.size / 2))
    val loadMax = if (allLoads.isEmpty) "null" else fmt2(allLoads.last)
    val gcTotal = timings.flatMap(_._6).sum
    // Full per-run detail to a standalone file: the driver keeps only a
    // ~2 KB stdout tail, which truncates most of the per-query map on a
    // 271-query surface — the file is the judge's complete record (min
    // AND median per query; medians separate real regressions from host
    // noise that min-of-N alone can mask on a loaded box).
    //
    // r19 (verdict r18 item #2): the file's TOP LEVEL is now the exact
    // headline contract object — {"metric","unit","sf","queries":{name:
    // min-sec},"failed","value"} plus the summary fields — because a
    // 271-entry map is ~6 KB and can NEVER ride a 2 KB stdout tail (round
    // 3 proved the driver does not keep an unbounded last line; round 9
    // proved a long line truncates head-first). The stable sidecar path
    // (default `bench_queries.json`, or $SPARK_GRAFT_BENCH_QUERIES_OUT)
    // is therefore the per-query channel of record; the per-run detail
    // moved under "queries_detail" (rising_runs.py reads both shapes).
    // Nothing about what is timed changed.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES_OUT",
      "bench_queries.json")
    try {
      val detail = timings.map { case (name, failed, ts, raw, loads, gcs) =>
        // True median: average the two middle elements for even run
        // counts (ts(size/2) alone reports the MAX of a 2-run sample).
        val med =
          if (ts.isEmpty) -1.0
          else if (ts.size % 2 == 1) ts(ts.size / 2)
          else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
        val mn = if (failed || ts.isEmpty) -1.0 else ts.head
        // load = 1-min system loadavg at each run's START (arrival order,
        // aligned with runs_raw); gc_ms = JVM GC time spent inside that
        // run. Both diagnose a contaminated artifact without changing it.
        s""""$name":{"min":$mn,"median":${if (failed) -1.0 else med},"runs":[${ts.mkString(",")}],""" +
          s""""runs_raw":[${raw.mkString(",")}],"load":[${loads.map(fmt2).mkString(",")}],"gc_ms":[${gcs.mkString(",")}]}"""
      }.mkString("{", ",", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (s"""{"metric":"total","unit":"sec","sf":"$sfDir","cpus":"$cpus",""" +
          s""""runs_per_query":$runs,"n_queries":${results.size},""" +
          s""""failed":$failed,"load_med":$loadMed,"load_max":$loadMax,""" +
          s""""gc_total_ms":$gcTotal,"calib_med":${fmt2(calibMed)},""" +
          s""""high_state":$highState,"queries":$qs,"value":$total,""" +
          s""""calibration":$calibJson,"queries_detail":$detail}""")
          .getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"BENCH: could not write $outPath: ${e.getMessage}")
    }
    // Field order matters: the driver keeps only the tail of stdout, so the
    // headline total (and failure list) must come AFTER the long per-query
    // map or a truncated capture loses them (this cost round 3 its total).
    println(s"""{"metric":"total","unit":"sec","sf":"$sfDir","queries":$qs,"failed":$failed,"value":$total}""")
    // The per-query map outgrew the driver's ~4 KB stdout tail in round 9
    // (255 queries truncated the line's HEAD, so even trailing fields were
    // unparseable). A compact summary line LAST always fits in the tail and
    // parses on its own. load_med (median 1-min loadavg across all timed
    // runs) rides along so a contaminated artifact announces itself in the
    // headline — r12's was only diagnosed via a three-way git comparison.
    // load_med / load_max / gc_total_ms land in the driver's `parsed`
    // block (it keeps this last line verbatim), so every BENCH_r*.json is
    // self-diagnosing round-over-round without opening bench_queries.json
    // (verdict r13 item 3): load_max >> cores flags a contaminated pass,
    // gc_total_ms ~ total wall flags memory pressure. queries_file names
    // the stable per-query sidecar (the full name→seconds map in contract
    // shape) so a tail-only reader knows where the complete record lives.
    println(s"""{"metric":"total","unit":"sec","sf":"$sfDir","n_queries":${results.size},"failed":$failed,"load_med":$loadMed,"load_max":$loadMax,"gc_total_ms":$gcTotal,"calib_med":${fmt2(calibMed)},"high_state":$highState,"queries_file":"bench_queries.json","value":$total}""")
    spark.stop()
  }
}
