package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, FuzzyJoin}
import graft.sim.Similarity

/** Measured scaling curve for the candidate-generation machinery: a 10×
  * corpus built so the TRUE near-dup structure is exactly 10 copies of the
  * 1× structure (each replica gets a disjoint token space / an isometric
  * embedding rotation, so replicas cannot cross-pair), which turns "no
  * quadratic blowup at scale" from a review claim into an assertion:
  * bucketed candidate generation must report ~10× the pairs, not ~100×,
  * and runtime must stay far under the quadratic envelope.
  */
class ScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  /** 1× corpus with planted near-dup pairs: every 20th doc gets a copy
    * with its last token dropped (3-shingle Jaccard ≈ 0.97).
    */
  private def corpus1: DataFrame = {
    val base = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ')")
          .as("text"))
    base.unionAll(planted)
  }

  /** 10× replication with per-replica token suffixing: shingle sets of
    * different replicas are disjoint, so every true pair lives inside one
    * replica and the true pair count is exactly 10× the 1× count.
    */
  private def corpus10: DataFrame =
    corpus1.withColumn("k", explode(sequence(lit(0), lit(9))))
      .select((col("doc_id") + col("k") * 100000L).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1x"), col("k")))
          .as("text"))

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  test("minhash LSH candidate generation scales linearly from 1x to 10x") {
    val (c1, t1) = timed(
      Dedup.minhashLshPairs(corpus1, "doc_id", "text", threshold = 0.8).count())
    spark.catalog.clearCache()
    val (c10, t10) = timed(
      Dedup.minhashLshPairs(corpus10, "doc_id", "text", threshold = 0.8).count())
    spark.catalog.clearCache()
    assert(c1 >= 25, s"planted pairs missing at 1x: $c1") // 25 planted copies
    // linear growth band: ~10× the 1× structure, never the ~100× a
    // cross-replica (quadratic) candidate stage would produce
    assert(c10 >= 8 * c1, s"recall collapsed at 10x: $c1 -> $c10")
    assert(c10 <= 12 * c1 + 20, s"super-linear pair growth: $c1 -> $c10")
    // generous wall-clock envelope: quadratic work would be ~100× —
    // allow wide noise margins around the expected ~10×
    assert(t10 <= 30 * (t1 + 0.2), f"runtime blowup: $t1%.2fs -> $t10%.2fs")
  }

  test("embedding cosinePairs scales linearly from 1x to 10x") {
    val base = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // planted exact-direction dups (scaling preserves cosine = 1)
    val planted = base.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        expr("transform(embedding, x -> x * 1.001f)").as("embedding"))
    val emb1 = base.unionAll(planted)
    // per-replica Rademacher sign flip (a diagonal orthogonal transform):
    // within-replica inner products are IDENTICAL to 1× (both vectors see
    // the same signs), while cross-replica patterns differ on ~half the
    // coordinates, randomizing cross cosines to ~N(0, 1/√dim) — far below
    // the 0.4 threshold
    val emb10 = emb1.withColumn("k", explode(sequence(lit(0), lit(9))))
      .select((col("vec_id") + col("k") * 100000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> x * cast(1 - 2 * pmod(hash(i, k), 2) as float))")
          .as("embedding"))

    // threshold 0.8: the fixture has zero natural pairs there, so the 1×
    // truth is exactly the 25 planted pairs, and the cross-replica noise
    // tail (std ~1/√dim ≈ 0.13) has ~e^-20 mass past 0.8 — the 10× truth
    // is exactly 250
    val (p1, t1) = timed(
      Similarity.cosinePairs(emb1, "vec_id", "embedding", threshold = 0.8).count())
    spark.catalog.clearCache()
    val (p10, t10) = timed(
      Similarity.cosinePairs(emb10, "vec_id", "embedding", threshold = 0.8).count())
    spark.catalog.clearCache()
    assert(p1 >= 25, s"planted pairs missing at 1x: $p1")
    assert(p10 >= 8 * p1, s"recall collapsed at 10x: $p1 -> $p10")
    assert(p10 <= 12 * p1 + 30, s"super-linear pair growth: $p1 -> $p10")
    assert(t10 <= 30 * (t1 + 0.2), f"runtime blowup: $t1%.2fs -> $t10%.2fs")
  }

  test("substring dedup scales linearly from 1x to 10x") {
    // Disclaimer (10 tokens ≥ k=8) planted into every 5th doc; the
    // per-replica token suffix makes replica window-keys disjoint, so
    // each replica is an exact isomorphic copy of the 1× dup structure
    // (ids shift monotonically — the same min-(doc,pos) winner per
    // replica) and total removed tokens must be exactly ~10×.
    val base = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val c1 = base.withColumn("text",
      when(col("doc_id") % 5 === 0, concat(col("text"),
        lit(" shared disclaimer tokens appear verbatim in every fifth document")))
        .otherwise(col("text")))
    val c10 = c1.withColumn("k", explode(sequence(lit(0), lit(9))))
      .select((col("doc_id") + col("k") * 100000L).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1x"), col("k")))
          .as("text"))
    val (d1, t1) = timed(Dedup.dedupSubstrings(c1, "doc_id", "text", k = 8)
      .agg(sum("n_dup_tokens")).as[Long].head())
    spark.catalog.clearCache()
    val (d10, t10) = timed(Dedup.dedupSubstrings(c10, "doc_id", "text", k = 8)
      .agg(sum("n_dup_tokens")).as[Long].head())
    spark.catalog.clearCache()
    assert(d1 > 0, "planted disclaimer spans not detected at 1x")
    assert(d10 >= 8 * d1 && d10 <= 12 * d1, s"non-linear span growth: $d1 -> $d10")
    assert(t10 <= 30 * (t1 + 0.2), f"runtime blowup: $t1%.2fs -> $t10%.2fs")
  }

  test("fuzzy join candidate structure scales EXACTLY 10x from 1x to 10x") {
    // digit bases (length 8) + a per-replica 4-letter suffix: equal
    // total lengths and a fully-mismatched 4-char letter block put every
    // cross-replica pair at distance ≥ 3 > maxDist, while intra-replica
    // distances are untouched (same suffix both sides) — so the true
    // pair relation of the 10× pool is EXACTLY 10 disjoint copies and
    // the exact-verified output must multiply by exactly 10.
    val rnd = new scala.util.Random(31)
    val b = {
      var prev = "00000000"
      (1 to 240).map { i =>
        val s =
          if (i % 5 == 0) prev.updated(2, 'x').updated(5, 'y') // planted 2-edit pair
          else (1 to 8).map(_ => ('0' + rnd.nextInt(10)).toChar).mkString
        prev = s
        (i.toLong, s)
      }
    }
    def pool(reps: Int) = b.flatMap { case (i, s) =>
      (0 until reps).map(k =>
        (i + k * 100000L, s + ("" + ('a' + k).toChar) * 4))
    }
    def count(rows: Seq[(Long, String)]): Long = {
      val df = rows.toDF("id", "str")
      FuzzyJoin.editDistancePairs(df, df, maxDist = 2)
        .filter(col("a_id") < col("b_id")).count()
    }
    val c1 = count(pool(1))
    val c10 = count(pool(10))
    assert(c1 > 0, "no near pairs at 1x — the planted variants vanished")
    assert(c10 == 10 * c1, s"fuzzy pair structure must be exactly 10x: $c1 -> $c10")
  }
}
