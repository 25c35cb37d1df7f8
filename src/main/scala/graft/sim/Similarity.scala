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

  /** Euclidean norm of a quantized vector — precompute ONCE per vector
    * before any pairwise stage: quantizedCosine recomputes both self-dots
    * for every pair, which triples the dot-product work inside O(n²) or
    * |corpus|×|queries| loops. Same doubles, same rounding, so results
    * are bit-identical to the inline form.
    */
  def quantizedNorm(qa: Column): Column =
    sqrt(quantizedDot(qa, qa).cast("double"))

  /** Cosine from a precomputed dot and per-side norms. */
  def cosineFromNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb.cast("double") / (normA * normB)

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
      .withColumn("qn", quantizedNorm(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol), quantScale).as("cv"))
      .withColumn("cn", quantizedNorm(col("cv")))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineFromNorms(quantizedDot(col("qv"), col("cv")), col("qn"), col("cn")))
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
      .withColumn("nrm", quantizedNorm(col("v")))
    q.as("a").join(broadcast(q.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineFromNorms(quantizedDot(col("a.v"), col("b.v")),
          col("a.nrm"), col("b.nrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ------------------------------------------------------------ IVF path

  /** IVF (inverted-file) coarse quantizer, driver-resident (the shape
    * MLlib KMeans uses): deterministic seed centroids (every |corpus|/k-th
    * vector by id), refined with `iters` Lloyd iterations. The k×dim
    * centroid table is a few KB — it lives on the driver and enters each
    * plan as LITERALS, so Lloyd assignment is a pure projection (no join,
    * no shuffle, stays in whole-stage codegen) and each iteration costs
    * exactly one hash aggregation for the means. Same driver-residency
    * contract as a broadcast-join side.
    */
  def ivfCentroidsLocal(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2,
      quantScale: Int = 1000): Seq[(Int, IndexedSeq[Long])] = {
    val q = corpus.select(col(idCol).as("id"), quantize(col(vecCol), quantScale).as("v"))
    val n = q.count()
    val stride = math.max(1L, n / k)
    def seedFrom(df: DataFrame): Seq[(Int, IndexedSeq[Long])] = df
      .orderBy(col("id")).limit(k)
      .select(col("v")).collect().toIndexedSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](0).toIndexedSeq) }
    var cents = seedFrom(q.filter(pmod(col("id"), lit(stride)) === 0))
    // Id spacing can miss the stride entirely (e.g. all-odd ids): fall
    // back to the first k vectors; an empty corpus yields Nil and skips
    // Lloyd (callers return empty results).
    if (cents.isEmpty) cents = seedFrom(q)
    (0 until iters).foreach { _ => if (cents.nonEmpty) {
      val assigned = q
        .withColumn("_vn", quantizedNorm(col("v")))
        .select(nearestCid(col("v"), col("_vn"), cents).as("cid"), col("v"))
      val means = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x")).as("mx"))
        .collect() // k×dim rows — a few KB
      cents = means.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(r => math.round(r.getDouble(2))).toIndexedSeq)
      }
    }}
    cents
  }

  /** DataFrame view of [[ivfCentroidsLocal]] (cid, cv) for callers that
    * want the centroid table as a relation.
    */
  def ivfCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2,
      quantScale: Int = 1000): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.types._
    val rows = ivfCentroidsLocal(corpus, idCol, vecCol, k, iters, quantScale)
      .map { case (cid, cv) => org.apache.spark.sql.Row(cid, cv) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("cid", IntegerType, nullable = false),
        StructField("cv", ArrayType(LongType)))))
  }

  /** Nearest centroid id as a literal expression: max of (sim, -cid, cid)
    * structs — highest cosine wins, ties to the lowest cid. `vn` is the
    * caller's precomputed vector norm (compute it once, not per centroid).
    */
  private def nearestCid(v: Column, vn: Column, cents: Seq[(Int, IndexedSeq[Long])]): Column = {
    val scored = cents.map { case (cid, cv) =>
      val cn = math.sqrt(cv.map(x => x.toDouble * x.toDouble).sum)
      struct(
        cosineFromNorms(quantizedDot(v, array(cv.map(lit): _*)), vn, lit(cn)).as("s"),
        lit(-cid).as("nc"), lit(cid).as("cid"))
    }
    array_max(array(scored: _*)).getField("cid")
  }

  /** IVF approximate top-k: corpus vectors are indexed by nearest
    * centroid (a projection against the driver-resident centroid
    * literals); each query probes its `nprobe` nearest cells and ranks
    * candidates exactly. Candidate volume ≈ |corpus|·nprobe/k — the
    * classic recall/cost dial. The only join is the candidate equi-join
    * on the cell id, with the tiny probe side broadcast.
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
    val cents = ivfCentroidsLocal(corpus, idCol, vecCol, nCells, quantScale = quantScale)
    if (cents.isEmpty) { // empty corpus: no cells, no neighbors
      val spark = corpus.sparkSession
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("query_id", queries.schema(queryIdCol).dataType),
          StructField("neighbor_id", corpus.schema(idCol).dataType),
          StructField("rank", LongType), StructField("cosine", DoubleType))))
    }
    val indexed = corpus
      .select(col(idCol).as("neighbor_id"), quantize(col(vecCol), quantScale).as("cv0"))
      .withColumn("cn0", quantizedNorm(col("cv0")))
      .withColumn("cid", nearestCid(col("cv0"), col("cn0"), cents))

    // Top-nprobe cells per query, sorted by (psim desc, cid asc) — the
    // probe ranking is an array sort over nCells literal scores, not a
    // join + window.
    def probeArr(qv: Column, qn: Column) = array(cents.map { case (cid, cv) =>
      val cn = math.sqrt(cv.map(x => x.toDouble * x.toDouble).sum)
      struct(
        (-cosineFromNorms(quantizedDot(qv, array(cv.map(lit): _*)), qn, lit(cn))).as("np"),
        lit(cid).as("cid"))
    }: _*)
    val qProbes = queries
      .select(col(queryIdCol).as("query_id"), quantize(col(vecCol), quantScale).as("qv"))
      .withColumn("qn", quantizedNorm(col("qv")))
      .withColumn("probe",
        explode(slice(array_sort(probeArr(col("qv"), col("qn"))), 1, nprobe)))
      .select(col("query_id"), col("qv"), col("qn"), col("probe.cid").as("cid"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    indexed
      .join(broadcast(qProbes),
        indexed("cid") === qProbes("cid") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineFromNorms(quantizedDot(col("qv"), col("cv0")), col("qn"), col("cn0")))
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
      .withColumn("cn", quantizedNorm(col("cv")))
    // Compute the bucket once, derive the hamming-1 probes by XOR on the
    // materialized column — re-expanding the plane dot products per probe
    // multiplies the expression tree nPlanes-fold for no gain.
    val probes = array(
      (col("qb0") +: (0 until nPlanes).map(i =>
        col("qb0").bitwiseXOR(lit(1L << i)))): _*)
    val q = queries.select(col(queryIdCol).as("query_id"),
        quantize(col(vecCol)).as("qv"), lshBucket(col(vecCol), planes).as("qb0"))
      .withColumn("qn", quantizedNorm(col("qv")))
      .select(col("query_id"), col("qv"), col("qn"), explode(probes).as("qbucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q),
        col("bucket") === col("qbucket") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineFromNorms(quantizedDot(col("qv"), col("cv")), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }
}
