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

  test("heavyHitters ranks by count then key, with exact shares") {
    // group g: key 1 ×6, key 2 ×3, key 3 ×1; group h: keys 7 and 8 tied
    val df = (Seq.fill(6)(("g", 1L)) ++ Seq.fill(3)(("g", 2L)) ++
      Seq(("g", 3L), ("h", 8L), ("h", 7L))).toDF("grp", "k")
    val out = SkewOps.heavyHitters(df, Seq("grp"), "k", topK = 2)
      .orderBy("grp", "hh_rank").collect()
    assert(out.length == 4)
    val g1 = out(0)
    assert(g1.getLong(g1.fieldIndex("k")) == 1L &&
      g1.getLong(g1.fieldIndex("cnt")) == 6L &&
      g1.getLong(g1.fieldIndex("share_micro")) == 600000L &&
      g1.getLong(g1.fieldIndex("cum_share_micro")) == 600000L)
    val g2 = out(1)
    assert(g2.getLong(g2.fieldIndex("k")) == 2L &&
      g2.getLong(g2.fieldIndex("cum_share_micro")) == 900000L)
    // tie in h breaks to the smaller key
    assert(out(2).getLong(out(2).fieldIndex("k")) == 7L)
    assert(out(3).getLong(out(3).fieldIndex("cum_share_micro")) == 1000000L)
  }

  test("heavyHitters topK caps output per group") {
    val df = (1 to 100).map(i => ("g", i.toLong % 10)).toDF("grp", "k")
    assert(SkewOps.heavyHitters(df, Seq("grp"), "k", topK = 3).count() == 3L)
  }
}
