package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`) — brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane LSH variant
  * as the scale path (Charikar 2002). Beyond-reference capability per the
  * project brief.
  */
object Similarity {

  /** Sequential-order double dot product via zip_with + aggregate — the
    * fold is left-to-right, so results are bit-stable across runs and
    * engines that evaluate in index order.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Quantize a float vector to integers (`round(x*scale)` as long).
    * Integer dot products are exact and order-independent, which makes
    * similarity rankings deterministic across engines — used by the
    * oracle-checked queries; full float cosine is available above.
    */
  def quantize(a: Column, scale: Int = 1000): Column =
    transform(a, x => round(x.cast("double") * scale).cast("long"))

  /** Native codegen'd integer dot — the HOF form (aggregate over zip_with)
    * evaluates interpreted and dominates the |corpus|×|queries| hot loop.
    */
  def quantizedDot(qa: Column, qb: Column): Column =
    graft.GraftFunctions.dotI64(qa, qb)

  def quantizedCosine(qa: Column, qb: Column): Column =
    quantizedDot(qa, qb).cast("double") /
      (sqrt(quantizedDot(qa, qa).cast("double")) * sqrt(quantizedDot(qb, qb).cast("double")))

  /** Exact brute-force top-k: broadcast the (small) query set against the
    * corpus, rank per query with a deterministic tiebreak. The corpus side
    * is never shuffled before the ranking aggregation; at 1000 executors
    * this is a map-side broadcast join + per-query top-k.
    */
  def bruteForceTopK(
      corpus: DataFrame,   // (idCol, vecCol)
      queries: DataFrame,  // (queryIdCol, vecCol)
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      k: Int,
      quantScale: Int = 1000): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"),
      quantize(col(vecCol), quantScale).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol), quantScale).as("cv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", quantizedCosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs whose
    * quantized cosine meets the threshold. Exact — the dedup-family member
    * for embedding columns, oracle-checkable because quantized arithmetic
    * is bit-stable across engines.
    *
    * Scale shape: |corpus|² dot products is the exact-answer lower bound;
    * here the right side is broadcast (vectors are narrow after
    * quantization) so the left side never shuffles, and the dot is a
    * native codegen'd expression. When approximate recall is acceptable at
    * corpus scale, [[lshTopK]]'s sign-bucket join is the prefilter path.
    */
  def cosinePairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      quantScale: Int = 1000): DataFrame = {
    val q = corpus.select(col(idCol).as("id"), quantize(col(vecCol), quantScale).as("v"))
    q.as("a").join(broadcast(q.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        quantizedCosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ------------------------------------------------------------ IVF path

  /** IVF (inverted-file) coarse quantizer: deterministic seed centroids
    * (every |corpus|/k-th vector by id), refined with `iters` Lloyd
    * iterations, all as DataFrame ops — assignment is a broadcast join
    * against the (tiny) centroid table + per-vector argmin, means are one
    * hash aggregation per iteration. Returns (cid, cvec) quantized.
    */
  def ivfCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2,
      quantScale: Int = 1000): DataFrame = {
    val q = corpus.select(col(idCol).as("id"), quantize(col(vecCol), quantScale).as("v"))
    val n = q.count()
    val stride = math.max(1L, n / k)
    // row_number over a constant partition: the frame is k rows (post-
    // limit), so the single-partition window is intentional — partitionBy
    // a literal rather than tripping WindowExec's missing-partition warning.
    var centroids = q.filter(pmod(col("id"), lit(stride)) === 0)
      .limit(k)
      .select((row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("id"))) - 1).as("cid"), col("v").as("cv"))
    (0 until iters).foreach { _ =>
      val assigned = assignToNearest(q, centroids)
      centroids = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x")).as("mx"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("ps"))
        .select(col("cid"),
          transform(col("ps"), p => round(p.getField("mx")).cast("long")).as("cv"))
    }
    centroids
  }

  /** Nearest centroid per vector: broadcast the centroid table, score with
    * the native dot-derived cosine, argmin via max_by on (similarity).
    */
  private def assignToNearest(q: DataFrame, centroids: DataFrame): DataFrame =
    q.join(broadcast(centroids))
      .withColumn("sim", quantizedCosine(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("cid"),
        first(col("v")).as("v"))

  /** IVF approximate top-k: corpus vectors are indexed by nearest
    * centroid; each query probes its `nprobe` nearest cells and ranks
    * candidates exactly. Candidate volume ≈ |corpus|·nprobe/k — the
    * classic recall/cost dial. All joins are equi-joins on the cell id;
    * the centroid table is broadcast everywhere.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      k: Int,
      nCells: Int = 16,
      nprobe: Int = 4,
      quantScale: Int = 1000): DataFrame = {
    // Lazy persist: the tiny centroid table is reused across three joins.
    // persist keeps lineage (lost blocks recompute, not fail); callers
    // looping over corpora release blocks with clearCache, as Bench does.
    val cents = ivfCentroids(corpus, idCol, vecCol, nCells, quantScale = quantScale)
      .persist()
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol), quantScale).as("cv0"))
    val indexed = assignToNearest(
        c.select(col("neighbor_id").as("id"), col("cv0").as("v")), cents)
      .select(col("id").as("neighbor_id"), col("cid"), col("v").as("cv0"))

    val probeRank = Window.partitionBy(col("query_id")).orderBy(col("psim").desc, col("cid"))
    val qProbes = queries
      .select(col(queryIdCol).as("query_id"), quantize(col(vecCol), quantScale).as("qv"))
      .join(broadcast(cents))
      .withColumn("psim", quantizedCosine(col("qv"), col("cv")))
      .withColumn("pr", row_number().over(probeRank))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    indexed.join(broadcast(qProbes),
        indexed("cid") === qProbes("cid") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", quantizedCosine(col("qv"), col("cv0")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Deterministic random hyperplanes (driver-side, seeded). */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket key: bit i set iff dot(vec, plane_i) > 0. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k with multi-probe: corpus vectors land
    * in one sign-bit bucket; each query probes its own bucket plus every
    * bucket at Hamming distance 1 (flip one plane's bit) — the standard
    * multi-probe trick (Lv et al., VLDB'07) that recovers most of the
    * recall lost to near-boundary vectors without growing the corpus-side
    * index. Candidates are then ranked exactly.
    *
    * Scale shape: the corpus side is bucketed once (equi-join key), the
    * probe side is |queries| × (nPlanes+1) rows — still tiny and
    * broadcastable. Shuffle volume stays per-bucket, never corpus×queries.
    * Recall/cost is tuned via nPlanes (fewer planes = bigger buckets =
    * higher recall, more compute).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      k: Int,
      nPlanes: Int = 8,
      seed: Long = 42L,
      dim: Int = 0): DataFrame = {
    // dim must match the embedding width: a mismatched hyperplane length
    // makes zip_with pad with nulls, every plane dot goes null, and all
    // vectors silently collapse into bucket 0 (full brute force). Derive
    // it from the data unless the caller pins it.
    val planeDim =
      if (dim > 0) dim
      else corpus.select(size(col(vecCol))).head(1).headOption.map(_.getInt(0)).getOrElse(1)
    val planes = hyperplanes(planeDim, nPlanes, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol)).as("cv"), lshBucket(col(vecCol), planes).as("bucket"))
    // Compute the bucket once, derive the hamming-1 probes by XOR on the
    // materialized column — re-expanding the plane dot products per probe
    // multiplies the expression tree nPlanes-fold for no gain.
    val probes = array(
      (col("qb0") +: (0 until nPlanes).map(i =>
        col("qb0").bitwiseXOR(lit(1L << i)))): _*)
    val q = queries.select(col(queryIdCol).as("query_id"),
        quantize(col(vecCol)).as("qv"), lshBucket(col(vecCol), planes).as("qb0"))
      .select(col("query_id"), col("qv"), explode(probes).as("qbucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q),
        col("bucket") === col("qbucket") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", quantizedCosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }
}
