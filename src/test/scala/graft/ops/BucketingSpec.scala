package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join scale pattern: both sides written
  * bucketed+sorted by the join key join WITHOUT a shuffle exchange on
  * either side (SortMergeJoin reads bucket files directly). At 100 TB this
  * is the difference between re-shuffling the fact table per query and
  * sharing one physical layout across every join on the key.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without shuffle exchanges") {
    // Force a sort-merge join: at this scale broadcast would win and make
    // the no-shuffle assertion vacuous.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = graft.Tables.load(spark, sf001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = graft.Tables.load(spark, sf001, "orders")
      .select("o_orderkey", "o_totalprice")

    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it returns the same rows as the shuffled join
      assert(joined.count() == li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
