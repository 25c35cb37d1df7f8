package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge RELATIONS — the category next to
  * [[graft.dedup.Dedup.connectedComponents]] (which serves the dedup
  * cluster pass): rank/centrality passes a corpus pipeline runs over its
  * link graph (crawl-frontier prioritization, domain quality weighting à
  * la Common Crawl's harmonic-centrality lists) expressed as repeated
  * keyed join + aggregation, never adjacency matrices.
  *
  * Every iteration is the same two hash shuffles (contributions keyed by
  * `dst`, rank refresh keyed by `node`), so a 100 TB edge relation runs
  * at a constant memory footprint per executor; the static relations
  * (edges, degrees, nodes) are persisted once and reused by all
  * iterations, and AQE's skew split handles hot hubs (the web's in-degree
  * power law) like any other skewed aggregation.
  */
object GraphOps {

  /** Rank scale: ranks are fixed-point longs in units of 10⁻¹². */
  val RankScale: Long = 1000000000000L

  /** PageRank (Brin & Page '98) with a FIXED iteration count, in exact
    * fixed-point integer arithmetic so the result is deterministic —
    * independent of partitioning, join order, and float summation order —
    * and hash-oracles against any engine that floor-divides the same way:
    *
    *   rank₀(v)   = RankScale div N
    *   rankᵢ₊₁(v) = (15·RankScale) div (100·N)
    *              + (17 · Σ_{u→v} rankᵢ(u) div outdeg(u)) div 20
    *
    * The damping factor 0.85 is the rational 17/20 — floating 0.85 is
    * not exactly representable and `floor(0.85·x)` disagrees between
    * decimal and binary engines exactly when x is a multiple of 20 (a
    * common case), so the integer form is load-bearing, not style.
    * Per-iteration floor truncation loses < 1 unit of 10⁻¹² per edge —
    * invisible at ranking granularity.
    *
    * Dangling nodes (no out-edges) are given a SELF-LOOP before the
    * degree pass — they keep their own mass instead of leaking total
    * rank each iteration (the "lumped" variant; documented, determinate,
    * and free of the per-iteration global dangling-mass scalar that a
    * redistribution variant would broadcast).
    *
    * `edges` must have long-typed `src`/`dst` columns; duplicate edges
    * are collapsed (set semantics). Returns `(node, rank)`.
    *
    * Scale: the driver holds ONE scalar (the node count — same residency
    * class as the k-means centroid count); edges/degrees/nodes persist
    * across iterations; each iteration's lineage is two joins + one
    * aggregation deep and the final action evaluates the whole chain
    * lazily. No collect of ranks, no adjacency broadcast.
    */
  def pageRank(edges: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val e = edges
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val selfLoops = nodes
      .join(e.select(col("src")).distinct(),
        col("node") === col("src"), "left_anti")
      .select(col("node").as("src"), col("node").as("dst"))
    val allE = e.union(selfLoops).persist(StorageLevel.MEMORY_AND_DISK)
    val deg = allE.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val base = 15L * RankScale / (100L * n)

    var ranks = nodes.select(col("node"), lit(RankScale / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(allE, col("node") === col("src"))
        .join(deg, "src")
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(17 * coalesce(s, 0L)) div 20")).as("rank"))
    }
    ranks
  }
}
