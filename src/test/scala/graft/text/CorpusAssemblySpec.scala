package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusAssemblySpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.Tables.load(spark, sf001, "documents")

  test("shuffleShards: per-shard positions are a contiguous 1..n permutation") {
    val out = CorpusAssembly.shuffleShards(
      docs.select("doc_id"), "doc_id", nShards = 4, seed = "s1")
    val n = out.count()
    assert(n == docs.count())
    // Every shard's positions are exactly 1..count(shard).
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("nd") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("shuffleShards: deterministic per seed, re-seeded epochs differ") {
    val a1 = CorpusAssembly.shuffleShards(docs.select("doc_id"), "doc_id", 4, "e0")
      .select("doc_id", "shard", "pos").collect().map(_.toSeq).toSet
    val a2 = CorpusAssembly.shuffleShards(docs.select("doc_id"), "doc_id", 4, "e0")
      .select("doc_id", "shard", "pos").collect().map(_.toSeq).toSet
    val b = CorpusAssembly.shuffleShards(docs.select("doc_id"), "doc_id", 4, "e1")
      .select("doc_id", "shard", "pos").collect().map(_.toSeq).toSet
    assert(a1 == a2)
    assert(a1 != b) // a different epoch seed permutes differently
  }

  test("packSequences: offsets chain within each shard and chunk at the budget") {
    val out = CorpusAssembly.packSequences(
        docs.select("doc_id", "text"), "doc_id", "text",
        budgetTokens = 64, nShards = 4, seed = "p0")
      .select("doc_id", "shard", "seq_id", "seq_pos", "n_tokens")
      .collect()
    assert(out.length == docs.count())
    // Reconstruct each shard's stream: start offsets = prefix sums of
    // n_tokens in (seq_id, seq_pos) order; seq_id/seq_pos must re-derive
    // from that running offset.
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r.getLong(2), r.getLong(3)))
      var offset = 0L
      ordered.foreach { r =>
        assert(r.getLong(2) == offset / 64, s"seq_id mismatch at offset $offset")
        assert(r.getLong(3) == offset % 64, s"seq_pos mismatch at offset $offset")
        offset += r.getLong(4)
      }
    }
  }

  test("packSequences: token counts match the whitespace tokenizer") {
    val out = CorpusAssembly.packSequences(
      docs.select("doc_id", "text"), "doc_id", "text", 512, 2, "p1")
    val direct = docs.select(col("doc_id"),
      TextAnalysis.tokenCountWhitespace(col("text")).cast("long").as("n"))
    val joined = out.join(direct, "doc_id")
      .filter(col("n_tokens") =!= col("n"))
    assert(joined.count() == 0)
  }

  test("sampleStratified: listed fractions hold, unlisted strata get the default") {
    val out = CorpusAssembly.sampleStratified(
      docs, "lang", "doc_id",
      fractions = Map("en" -> 0.5, "de" -> 1.0), defaultFraction = 0.0,
      seed = "m0")
    val byLang = out.groupBy("lang").agg(count(lit(1)).as("kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == totals("de")) // fraction 1.0 keeps everything
    assert(byLang.keySet.subsetOf(Set("en", "de"))) // default 0.0 drops the rest
    val enFrac = byLang("en").toDouble / totals("en")
    assert(enFrac > 0.3 && enFrac < 0.7, s"en keep fraction off: $enFrac")
  }

  test("sampleStratified: survivors are the same rows under any partitioning") {
    val a = CorpusAssembly.sampleStratified(docs, "lang", "doc_id",
      Map("en" -> 0.4), 0.2, "m1").select("doc_id").as[Long].collect().toSet
    val b = CorpusAssembly.sampleStratified(docs.repartition(13), "lang", "doc_id",
      Map("en" -> 0.4), 0.2, "m1").select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("vocabCoverage: ranks ordered, counts non-increasing, coverage monotone to <= 1") {
    val rows = CorpusAssembly.vocabCoverage(docs, "text", k = 30)
      .orderBy("rank").collect()
    assert(rows.length == 30)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 30L))
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    val cov = rows.map(_.getDouble(3))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    assert(cov.last <= 1.0 && cov.head > 0.0)
  }

  test("capStrata: oversized strata shrink toward the cap, small ones pass whole") {
    val d = docs // sf0.001 lang counts are small; build a skewed frame
    val skew = d.select(col("doc_id"), lit("big").as("grp"))
      .union(d.limit(5).select((col("doc_id") + 1000000).as("doc_id"), lit("small").as("grp")))
    val out = CorpusAssembly.capStrata(skew, "grp", "doc_id", cap = 20, seed = "c0")
    val kept = out.groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 5) // under the cap: untouched
    val big = kept.getOrElse("big", 0L)
    val total = skew.filter(col("grp") === "big").count()
    assert(big < total, "oversized stratum was not downsampled")
    assert(big > 5 && big < 60, s"kept $big of $total, expected ~20 with jitter")
  }

  test("repetitionMetrics: counts and flag on constructed texts") {
    val d = Seq(
      (1L, "a b a b a b"),        // grams: ab,ba,ab,ba,ab → total 5, distinct 2, top 3
      (2L, "a b c d e f g h i j k"), // 10 distinct grams, no repeats: top 1/10 <= 20%
      (3L, "solo"),               // < 2 tokens: zero grams
      (4L, null: String))
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(d, "doc_id", "text")
      .orderBy("doc").collect()
    assert(m(0).getLong(1) == 5 && m(0).getLong(2) == 2 && m(0).getLong(3) == 3)
    assert(m(0).getBoolean(4))   // 3*5 > 5 and repeats 3*2 > 5
    assert(m(1).getLong(1) == 10 && m(1).getLong(2) == 10 && !m(1).getBoolean(4))
    assert(m(2).getLong(1) == 0 && !m(2).getBoolean(4))
    assert(m(3).getLong(1) == 0 && !m(3).getBoolean(4))
  }

  test("vocabCoverage: k >= vocabulary size covers everything") {
    val tiny = Seq((1L, "aa bb aa"), (2L, "bb cc")).toDF("doc_id", "text")
    val rows = CorpusAssembly.vocabCoverage(tiny, "text", k = 10)
      .orderBy("rank").collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("aa", 2L), ("bb", 2L), ("cc", 1L)))
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-9)
  }
}
