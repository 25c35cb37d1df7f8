package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` doorway this library uses: wrap a custom
  * [[LogicalPlan]] (graft.plans.AsOfJoinNode) in a DataFrame. Spark's
  * supported extension points (SparkSessionExtensions) let third parties
  * inject rules/strategies but expose no public constructor from a logical
  * plan to a DataFrame, so every library shipping its own plan node hosts
  * a shim like this inside the `org.apache.spark.sql` package.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Idempotently install a planner strategy into an existing session
    * (the programmatic counterpart of `spark.sql.extensions`, which is
    * fixed at first-session creation and can't help sessions the driver
    * harness already built). The check-then-append is synchronized on the
    * session: two threads building as-of frames concurrently would
    * otherwise race and install the strategy twice (harmless output,
    * double planning work).
    */
  def ensureStrategy(spark: SparkSession, s: org.apache.spark.sql.execution.SparkStrategy): Unit =
    spark.synchronized {
      val exp = spark.asInstanceOf[ClassicSparkSession].experimental
      if (!exp.extraStrategies.contains(s))
        exp.extraStrategies = exp.extraStrategies :+ s
    }

  /** Same, for an extra optimizer rule. */
  def ensureOptimizerRule(
      spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit =
    spark.synchronized {
      val exp = spark.asInstanceOf[ClassicSparkSession].experimental
      if (!exp.extraOptimizations.contains(r))
        exp.extraOptimizations = exp.extraOptimizations :+ r
    }
}
