package graft
// One-query plan dump — the targeted companion to ExplainAudit's fixed
// PLANS.md list. Usage: runMain graft.ExplainOne [sfDir] [query...]
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

object ExplainOne {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q1_pricing_summary")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN_FINAL=1: execute first, then print the FINAL
    // adaptive plan — AQE exchange reuse / runtime broadcasts are
    // invisible in the static explain.
    val runFinal = sys.env.get("SPARK_GRAFT_EXPLAIN_FINAL").contains("1")
    names.foreach { name =>
      println(s"########## $name")
      val df = SparkEntry.queries(name)(spark, d)
      // collect() executes THIS Dataset's QueryExecution (df.write would
      // plan a separate one whose adaptive plan we'd never see)
      if (runFinal) { df.collect(); () }
      println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
