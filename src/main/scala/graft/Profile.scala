package graft

import org.apache.spark.sql.SparkSession

/** Times a subset of `SparkEntry.queries` in isolation — the per-query
  * feedback loop for optimization work (Bench runs everything; this runs
  * one query N times so plan-compile noise and cache effects separate
  * from real execution cost).
  *
  * Usage: runMain graft.Profile <sfDir> <iters> <queryName> [queryName...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq match {
      case Nil => Seq("q_dedup_ngram_jaccard")
      case s   => s
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to iters).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $name iter=$i $dt%.3f s")
        dt
      }
      println(f"PROFILE $name min=${times.min}%.3f s median=${times.sorted.apply(iters / 2)}%.3f s")
    }
    spark.stop()
  }
}
