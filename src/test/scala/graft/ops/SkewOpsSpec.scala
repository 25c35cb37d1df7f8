package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join/agg must return exactly the unsalted results — only the
  * partitioning differs.
  */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed key distribution") {
    // 90% of big-side rows behind one hot key
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"p$i"))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2")).toDF("j", "label")

    val plain = big.join(small, col("k") === col("j")).select("k", "payload", "label")
    val salted = SkewOps.saltedJoin(big, small, "k", "j", saltFactor = 4)
      .select("k", "payload", "label")

    val a = plain.collect().map(_.toSeq).toSet
    val b = salted.collect().map(_.toSeq).toSet
    assert(a == b && a.size == 902)
  }

  test("saltedJoin supports left joins with unmatched rows preserved") {
    val big = Seq((1L, "x"), (2L, "y")).toDF("k", "payload")
    val small = Seq((1L, "m")).toDF("j", "label")
    val r = SkewOps.saltedJoin(big, small, "k", "j", saltFactor = 3, joinType = "left")
      .orderBy("k").collect()
    assert(r.length == 2)
    assert(r(0).getAs[String]("label") == "m")
    assert(r(1).isNullAt(r(1).fieldIndex("label")))
  }

  test("saltedCountSum equals direct aggregation") {
    val df = (1 to 500).map(i => (i % 3, i.toDouble)).toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val salted = SkewOps.saltedCountSum(df, "k", "v", saltFactor = 4)
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(direct.toSeq == salted.toSeq)
  }
}
