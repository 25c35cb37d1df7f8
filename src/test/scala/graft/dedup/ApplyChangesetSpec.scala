package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApplyChangesetSpec extends SparkSpec {
  import spark.implicits._

  test("upsert replaces, insert adds, delete removes, untouched pass through") {
    val base = Seq((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"))
      .toDF("id", "text", "src")
    val ch = Seq(
      (2L, "upsert", 1L, "b2", "s9"),
      (3L, "delete", 1L, null: String, null: String),
      (4L, "upsert", 1L, "d", "s3"))
      .toDF("id", "op", "seq", "text", "src")
    val out = Dedup.applyChangeset(base, ch, "id").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq ==
      Seq((1L, "a", "s1"), (2L, "b2", "s9"), (4L, "d", "s3")))
  }

  test("last writer wins by seq, upsert beats delete on ties, NULLs overwrite") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val ch = Seq(
      (1L, "delete", 1L, null: String), // revived by the later upsert
      (1L, "upsert", 2L, "a2"),
      (2L, "upsert", 1L, "b2"), // the later delete wins
      (2L, "delete", 5L, null: String),
      (3L, "delete", 7L, null: String), // equal seq: upsert wins...
      (3L, "upsert", 7L, null: String)) // ...and its NULL image overwrites
      .toDF("id", "op", "seq", "text")
    val out = Dedup.applyChangeset(base, ch, "id").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out(0).getString(1) == "a2")
    assert(out(1).isNullAt(1)) // upsert is a row image, not a patch
  }

  test("snapshotDiff-derived changeset replays old snapshot into new") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text")
    val nw = docs.filter($"doc_id" % 7 =!= 0)
      .withColumn("text",
        when($"doc_id" % 5 === 0, concat($"text", lit(" v2")))
          .otherwise($"text"))
      .unionByName(docs.filter($"doc_id" % 11 === 0)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
    val diff = Dedup.snapshotDiff(docs, nw, "doc_id", "text")
    val nwImg = nw.select($"doc_id".as("n_id"), $"text".as("n_text"))
    val changes = diff.filter($"status" === "removed")
      .select($"id".as("doc_id"), lit("delete").as("op"),
        lit(1L).as("seq"), lit(null).cast("string").as("text"))
      .unionByName(diff.filter($"status".isin("added", "changed"))
        .join(nwImg, col("id") === col("n_id"))
        .select(col("n_id").as("doc_id"), lit("upsert").as("op"),
          lit(1L).as("seq"), col("n_text").as("text")))
    val applied = Dedup.applyChangeset(docs, changes, "doc_id")
    assert(applied.except(nw).isEmpty && nw.except(applied).isEmpty)
  }
}
