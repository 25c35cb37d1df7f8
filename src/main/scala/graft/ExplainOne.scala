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
    names.foreach { name =>
      println(s"########## $name")
      println(SparkEntry.queries(name)(spark, d)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
