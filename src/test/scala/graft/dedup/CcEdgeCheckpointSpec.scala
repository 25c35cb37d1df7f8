package graft.dedup

import graft.SparkSpec

import org.apache.spark.sql.functions.col

/** Structural storage contracts of [[Dedup.connectedComponents]] (r16,
  * re-shaped r17 after ADVICE r16): the pair pipeline runs exactly ONCE
  * into RDD-level persisted blocks, the local path's union-find runs
  * exactly ONCE into localCheckpoint-backed LABEL blocks, and the edge
  * blocks release deterministically once the labels exist. The failure
  * modes pinned here:
  *
  *  1. an early `spark.catalog.clearCache()` must neither re-run the pair
  *     pipeline nor re-run union-find (the r15 CacheManager-persist cliff
  *     silently re-ran the whole pipeline inside the fused task on every
  *     later consumption) — RDD-level blocks are invisible to clearCache,
  *     and an accumulator proves zero recomputation;
  *  2. label blocks explicitly dropped at the RDD level make later
  *     consumption FAIL LOUDLY (checkpoint semantics) instead of silently
  *     recomputing;
  *  3. the labels frame is a bare LogicalRDD leaf — a consumer plan that
  *     references it K times (goldenRecords, bestRepresentatives) reads
  *     stored blocks K times and can never re-run union-find or pair
  *     generation (the r16 lazy fused task re-ran union-find per
  *     consumption — the q_golden residual);
  *  4. the edge blocks are unpersisted before the operator returns
  *     (ADVICE r16: deterministic release, not driver-GC-dependent).
  */
class CcEdgeCheckpointSpec extends SparkSpec {

  test("early clearCache neither breaks labels nor re-runs pair generation") {
    val sc = spark.sparkContext
    val acc = sc.longAccumulator("cc_pair_gen_partitions")
    import spark.implicits._
    val pairs = sc
      .parallelize(Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)), 2)
      .mapPartitions { it => acc.add(1); it } // counts pipeline executions
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
    val runsAfterBuild = acc.value // the one edge-count materialization
    assert(runsAfterBuild > 0, "edge materialization must run the pipeline")

    spark.catalog.clearCache() // the r15 hazard: release before consumption
    val got1 = labels.orderBy(col("doc")).collect()
      .map(r => (r.get(0), r.get(1)))
    val got2 = labels.orderBy(col("doc")).collect()
      .map(r => (r.get(0), r.get(1)))
    assert(got1.toSeq == Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (12L, 10L)))
    assert(got2.toSeq == got1.toSeq)
    assert(acc.value == runsAfterBuild,
      s"pair generation re-ran after clearCache (${acc.value} != " +
        s"$runsAfterBuild partition computations) — the edge pipeline must " +
        "materialize into RDD-level blocks, invisible to CacheManager release")
  }

  test("labels are a checkpointed leaf: consumption cannot re-run union-find, " +
      "and the edge blocks are already released") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
    // Contract 4: exactly ONE fresh persistent RDD — the label blocks.
    // The edge blocks were unpersisted inside the operator (their map
    // removal is synchronous even with blocking = false).
    val fresh = sc.getPersistentRDDs.filterNot { case (id, _) => before(id) }
    assert(fresh.size == 1,
      s"expected exactly the label blocks to remain persisted, got " +
        s"${fresh.size} fresh persistent RDDs — the edge blocks must be " +
        "released before connectedComponents returns")
    // Contract 3: the labels plan is a bare stored-blocks scan — no
    // mapPartitions/coalesce/exchange nodes left to re-execute, so a plan
    // consuming it K times re-reads blocks, never re-runs union-find.
    val nodes = labels.queryExecution.optimizedPlan.collect { case p => p }
    assert(nodes.length == 1 &&
        nodes.head.getClass.getSimpleName == "LogicalRDD",
      s"labels must be a single LogicalRDD leaf, got:\n${labels.queryExecution.optimizedPlan}")
  }

  test("an explicit RDD-level unpersist fails consumption loudly, never silently recomputes") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
    val fresh = sc.getPersistentRDDs.filterNot { case (id, _) => before(id) }
    assert(fresh.nonEmpty, "the checkpointed label RDD must be registered")
    fresh.values.foreach(_.unpersist(blocking = true))
    val e = intercept[Exception](labels.collect())
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(t =>
        Option(t.getMessage).exists(_.toLowerCase.contains("checkpoint"))),
      s"dropped checkpoint blocks must fail loudly (got $e) — a silent " +
        "recompute inside one task is the r15 cliff")
  }
}
