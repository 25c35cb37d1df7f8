package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A1 continuation-row merge — golden cases from the reference's algorithm
  * (handlers/kyrgyzstan.py:183-217) plus order-robustness under shuffled
  * input partitions (SURVEY.md §7.4).
  */
class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (0L, "preamble", "before any record"),   // leading orphan → own record
    (1L, "1234/ТЗ", "first record"),
    (2L, "", "continuation one"),
    (3L, "Name: artifact", "dropped row"),   // F3: skipped entirely
    (4L, "", "continuation two"),
    (5L, "№5678", "second record"),
    (6L, "", ""))                            // empty cells don't contribute

  private def merged = {
    val df = ShapeOps.withIndex(rows.toDF("ord", "reg", "txt"), col("ord"))
    MergeOps.continuationMerge(df, keyCol = "reg", valueCols = Seq("reg", "txt"))
      .orderBy("record_id")
  }

  test("golden merge: orphan, continuation folding, Name: drop") {
    val r = merged.select("reg", "txt").as[(String, String)].collect()
    assert(r.length == 3)
    assert(r(0) == ("preamble", "before any record"))
    assert(r(1) == ("1234/ТЗ", "first record continuation one continuation two"))
    assert(r(2) == ("№5678", "second record"))
  }

  test("merge is robust to shuffled input partitions") {
    val shuffled = rows.reverse.toDF("ord", "reg", "txt").repartition(5)
    val df = ShapeOps.withIndex(shuffled, col("ord"))
    val r = MergeOps.continuationMerge(df, keyCol = "reg", valueCols = Seq("reg", "txt"))
      .orderBy("record_id").select("txt").as[String].collect()
    assert(r.toSeq == Seq("before any record",
      "first record continuation one continuation two", "second record"))
  }

  test("invariant: record count = new-record rows + leading orphan group") {
    val df = ShapeOps.withIndex(rows.toDF("ord", "reg", "txt"), col("ord"))
    val kept = df.filter(!trim(col("reg")).startsWith("Name:"))
    val starts = kept.filter(TextOps.isNewRecord(col("reg"))).count()
    val hasOrphan = 1L // row 0 precedes the first start
    assert(merged.count() == starts + hasOrphan)
  }

  test("partitioned merge parallelizes per document") {
    val docs = Seq(
      ("d1", 0L, "1111/ТЗ", "a"), ("d1", 1L, "", "b"),
      ("d2", 0L, "2222/ТЗ", "x"), ("d2", 1L, "", "y"))
      .toDF("doc", "ord", "reg", "txt")
    val indexed = ShapeOps.withIndex(docs, col("ord"), Seq(col("doc")))
    val r = MergeOps.continuationMerge(indexed, keyCol = "reg",
      partitionBy = Seq("doc"), valueCols = Seq("txt"))
      .orderBy("doc").select("txt").as[String].collect()
    assert(r.toSeq == Seq("a b", "x y"))
  }

  test("OrderedConcat aggregator matches the plan-level ordered concat") {
    // shuffled partitions: merge() must still produce index order
    val ds = spark.createDataset(
      Seq((2L, "c"), (0L, "a"), (1L, "b"), (3L, ""), (4L, "d")))(
      org.apache.spark.sql.Encoders.product[(Long, String)])
      .repartition(3)
    val out = ds.groupByKey(_ => 0)(org.apache.spark.sql.Encoders.scalaInt)
      .agg(OrderedConcat.column)
      .collect()
    assert(out.head._2 == "a b c d")
  }

  test("sessionize splits on gap > threshold") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:10:00", 2.0),   // same session (10 min)
      (1L, "2024-01-01 01:00:00", 3.0),   // gap 50 min > 30 → new session
      (2L, "2024-01-01 00:00:00", 4.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val r = MergeOps.sessionize(ev, "user_id", "ts", gapSeconds = 1800)
      .groupBy("user_id", "session_id").count()
      .orderBy("user_id", "session_id")
      .select("count").as[Long].collect()
    assert(r.toSeq == Seq(2L, 1L, 1L))
  }
}
