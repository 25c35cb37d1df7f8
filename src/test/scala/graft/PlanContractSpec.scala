package graft

/** Physical-plan contracts for flagship queries — the properties PLANS.md
  * documents, asserted so a future change that silently loses a pushdown,
  * broadcast, or the custom operator fails CI instead of only showing up
  * as a bench regression. Plans are built at sf0.001 (plan shape is
  * scale-independent; AQE's initial plan is what's asserted).
  */
class PlanContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q3: segment filter reaches the customer scan; dims broadcast; top-k is TakeOrdered") {
    val p = planOf("q3_shipping_priority")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("star joins broadcast their dimensions — no sort-merge join") {
    for (q <- Seq("q_join_revenue", "q_broadcast_dims")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n${p.take(1500)}")
      assert(!p.contains("SortMergeJoin"), s"$q planned a sort-merge join")
    }
  }

  test("as-of queries run the custom physical operator, not a window") {
    for (q <- Seq("q_asof_join", "q_asof_forward")) {
      val p = planOf(q)
      assert(p.contains("AsOfJoin"), s"$q lost AsOfJoinExec:\n${p.take(1500)}")
      assert(!p.contains("Window"), s"$q regressed to the window form")
    }
  }

  test("partitioned continuation merge hash-partitions by source (no global window)") {
    val p = planOf("q_merge_partitioned")
    assert(p.contains("hashpartitioning(source"), p.take(2000))
  }

  test("contamination broadcasts the benchmark side") {
    val p = planOf("q_contamination")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("pure-projection hygiene queries shuffle only for the output sort") {
    for (q <- Seq("q_pii_redact", "q_hash_split")) {
      val p = planOf(q)
      val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).size
      assert(exchanges <= 1, s"$q should be scan→project→sort, saw $exchanges exchanges:\n${p.take(1500)}")
    }
  }

  test("round-6 queries: payload stats is a pure projection; approx percentile partial-aggregates") {
    val pStats = planOf("q_payload_stats")
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(pStats).size
    assert(exchanges <= 1,
      s"q_payload_stats should be scan→project→sort, saw $exchanges exchanges:\n${pStats.take(1500)}")
    // the scan must prune to the two consumed columns
    assert(!pStats.contains("lang") && !pStats.contains("source"),
      s"q_payload_stats reads pruned-away columns:\n${pStats.take(1500)}")
    val pApprox = planOf("q_approx_percentile")
    // bounded-state sketch MUST partial-aggregate (map-side merge) — the
    // whole point of the q_percentiles pairing; exact percentile cannot
    assert(pApprox.contains("partial_percentile_approx"),
      s"q_approx_percentile lost its partial aggregation:\n${pApprox.take(1500)}")
  }

  test("dedup candidate generation never plans a cross join") {
    for (q <- Seq("q_dedup_ngram_jaccard", "q_containment",
        "q_dedup_minhash_lsh", "q_dedup_simhash")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$q planned a quadratic join:\n${p.take(1500)}")
    }
  }

  test("round-5 hygiene queries: aggregation-shaped, no cross join, no windows") {
    for (q <- Seq("q_cross_dup_ngrams", "q_strip_boilerplate")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$q planned a quadratic join:\n${p.take(1500)}")
      // Both are hash-agg + equi-join pipelines: a Window over raw rows
      // would put a hot gram/segment's every copy on one reducer.
      assert(!p.contains("Window"),
        s"$q should aggregate, not window:\n${p.take(1500)}")
    }
  }

  test("q_dedup_embedding: no quadratic join, no corpus broadcast") {
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val df = SparkEntry.queries("q_dedup_embedding")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"quadratic join:\n${p.take(1500)}")
    // Every broadcast build side must be a tiny local relation (the cell
    // pair table) — never a subtree that reads the corpus parquet.
    val sp = df.queryExecution.sparkPlan
    sp.collect { case j: BroadcastHashJoinExec => j }.foreach { j =>
      val build = if (j.buildSide == BuildLeft) j.left else j.right
      assert(!build.collectLeaves().exists(_.isInstanceOf[FileSourceScanExec]),
        s"corpus broadcast detected:\n${build.treeString.take(800)}")
    }
    // The pair stage itself must be a shuffled (spill-safe) join.
    assert(sp.find(n => n.nodeName.contains("SortMergeJoin")).isDefined,
      s"pair join is not sort-merge:\n${sp.treeString.take(1500)}")
  }

  test("q_ann_ivf_joined broadcasts only the centroid/probe relations, never the corpus") {
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    val df = SparkEntry.queries("q_ann_ivf_joined")(spark, dir)
    val sp = df.queryExecution.sparkPlan
    assert(!sp.toString.contains("CartesianProduct"))
    // Centroid scoring folds its constant key into a BroadcastNestedLoop
    // against the k-row local relation — fine; what must NEVER happen is a
    // broadcast build side that reads the corpus parquet. The one
    // exception is the query-probe side (explicitly filtered tiny).
    val builds = sp.collect {
      case j: BroadcastHashJoinExec => if (j.buildSide == BuildLeft) j.left else j.right
      case j: BroadcastNestedLoopJoinExec => if (j.buildSide == BuildLeft) j.left else j.right
    }
    assert(builds.nonEmpty, sp.treeString.take(1000))
    builds.foreach { b =>
      val scans = b.collectLeaves().collect { case f: FileSourceScanExec => f }
      assert(scans.forall(_.toString.contains("LessThan(vec_id,10)")) || scans.isEmpty,
        s"corpus broadcast detected:\n${b.treeString.take(1000)}")
    }
  }

  test("corpus-assembly plans: no global-order windows, sampling/chunking shuffle-free") {
    // Shards/packing: the work window partitions by shard — never an
    // empty partitionBy (which would drag the corpus to one reducer).
    for (q <- Seq("q_shuffle_shards", "q_pack_sequences")) {
      val p = planOf(q)
      assert(p.contains("hashpartitioning(shard"),
        s"$q window not sharded:\n${p.take(2000)}")
    }
    // Sampling is a pure filter: its ONLY exchange is the test-contract
    // ORDER BY (a range partitioning), no hash shuffle anywhere.
    val ps = planOf("q_sample_stratified")
    assert(!ps.contains("hashpartitioning"), ps.take(2000))
    // Chunking is generator fan-out: same — no hash shuffle.
    val pc = planOf("q_chunk_docs")
    assert(!pc.contains("hashpartitioning"), pc.take(2000))
    // Stratum caps broadcast the count relation, never shuffle the corpus
    // for the join itself.
    val pk = planOf("q_cap_strata")
    assert(pk.contains("BroadcastHashJoin"), pk.take(2000))
  }

  test("bucketed as-of shards its exchanges on (key, time-bucket)") {
    val p = planOf("q_asof_bucketed")
    assert(p.contains("AsOfJoin"), p.take(1500))
    assert("hashpartitioning\\(user_id#\\d+L?, _graft_asof_lb".r
      .findFirstIn(p).isDefined, p.take(3000))
  }

  test("round-8 plans: substring dedup joins on the window key, sketch probes broadcast") {
    // ExactSubstr: the occurrence join back onto the (filtered, tiny)
    // key-count relation must never go cartesian, and the island merge
    // must window per-doc, not globally.
    val ps = planOf("q_dedup_substring")
    assert(!ps.contains("CartesianProduct"), ps.take(2000))
    assert(ps.contains("hashpartitioning(doc"), ps.take(3000))
    // Bloom probe: the (word, mask) filter relation enters as the
    // BROADCAST side — the corpus-side fingerprints are never shuffled
    // for the membership join.
    val pb = planOf("q_bloom")
    assert(pb.contains("BroadcastHashJoin"), pb.take(2000))
    assert(!pb.contains("CartesianProduct"))
    // Count-Min probe joins the broadcast-size counter relation.
    val pc = planOf("q_countmin")
    assert(pc.contains("BroadcastHashJoin"), pc.take(2000))
  }

  test("bloom-prefiltered join screens the big side MAP-SIDE, then broadcasts the dim") {
    val p = planOf("q_bloom_join")
    // the densified filter is evaluated as a plain Filter over the scan —
    // the membership test must appear as a filter condition (shiftleft of
    // the seeded addresses), not as a join against the (word, mask) rows
    assert(p.contains("shiftleft"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("HLL build is one partial-aggregating hash pass; no window, no join") {
    val p = planOf("q_hll")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("Window"), s"q_hll must not window:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("SCD-2 hash-partitions by the entity key and reuses ONE shuffle for both windows") {
    val p = planOf("q_scd2")
    assert(p.contains("hashpartitioning(user_id"), p.take(3000))
    // change-collapse lag + close-out lead must share the (key) exchange:
    // exactly one hash shuffle in the whole plan (the final ORDER BY adds
    // a range partitioning, not a hash one)
    val hashShuffles = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(hashShuffles == 1,
      s"q_scd2 re-shuffled between its two windows ($hashShuffles):\n${p.take(3000)}")
  }

  test("session-3 aggregation queries: one partial-aggregating pass, stats sides broadcast") {
    // linear trend and trimmed/shrunk means are partial-aggregable by
    // design — a map-side partial must exist and nothing may cartesian
    // against the data (the single-row/|groups|-row stats relations ride
    // broadcast joins)
    for (q <- Seq("q_linear_trend", "q_trimmed_stats", "q_shrunk_means")) {
      val p = planOf(q)
      assert(p.contains("HashAggregate"), s"$q lost its hash agg:\n${p.take(2000)}")
      assert(!p.contains("CartesianProduct"),
        s"$q planned a cartesian:\n${p.take(2000)}")
      assert(!p.contains("SortMergeJoin"),
        s"$q should broadcast its stats relation:\n${p.take(2000)}")
    }
  }

  test("changeset apply: winner election partial-aggregates; one join, no window") {
    val p = planOf("q_apply_changeset")
    assert(p.contains("partial_max_by") || p.contains("partial_maxby") ||
      p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"q_apply_changeset lost its winner agg:\n${p.take(2000)}")
    assert(!p.contains("Window"),
      s"q_apply_changeset must elect winners by agg, not window:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("sorted-neighborhood: range partitioning for ranks, offsets broadcast, block equi-join") {
    val p = planOf("q_sorted_neighborhood")
    assert(p.contains("rangepartitioning"),
      s"q_sorted_neighborhood lost its range exchange:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"offsets must broadcast:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"pairing must be a block equi-join:\n${p.take(3000)}")
  }

  test("session-4 projections: html/gopher are scan→project→sort, one shuffle") {
    for (q <- Seq("q_html_text", "q_gopher")) {
      val p = planOf(q)
      val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).size
      assert(exchanges <= 1,
        s"$q should be a pure projection + output sort, saw $exchanges exchanges:\n${p.take(1500)}")
      assert(!p.contains("HashAggregate") || q != "q_html_text")
    }
  }

  test("rankNormalize shares ONE group partitioning across both windows") {
    val p = planOf("q_rank_normalize")
    assert("hashpartitioning\\(source".r.findAllIn(p).size >= 1, p.take(2000))
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, // group window + output sort, nothing else
      s"rank+count must reuse one shuffle, saw $exchanges:\n${p.take(2000)}")
  }

  test("dsir: bucket weights ride broadcast joins; no cartesian, no window") {
    val p = planOf("q_dsir")
    assert(p.contains("BroadcastHashJoin"),
      s"q_dsir lost its weight broadcast:\n${p.take(2000)}")
    // the 1-row totals relation may ride a BroadcastNestedLoopJoin;
    // an unbroadcast cartesian is never acceptable
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Window"), s"q_dsir must not window:\n${p.take(2000)}")
  }

  test("golden records elect by aggregation, never by window") {
    val p = planOf("q_golden")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"))
    // Single-pass contract (r17): the member-count sentinel rides the
    // unpivot and its election win carries the count, so the operator is
    // ONE linear pipeline — the unpivot Generate plans once and the CC
    // labels leaf scans once. The regressed form (separate sizes +
    // election branches joined back) duplicates both, because filters on
    // the unpivot group key push below every aggregation and the branch
    // subtrees stop being exchange-reusable.
    def occurrences(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)
    assert(occurrences(p, "Generate") == 1,
      s"q_golden must unpivot exactly once (sizes and election share the " +
        s"sentinel pass):\n${p.take(3000)}")
    assert(occurrences(p, "Scan ExistingRDD") == 1,
      s"q_golden must scan the CC labels leaf exactly once:\n${p.take(3000)}")
    // The election contract is that no window runs over the cluster key —
    // a hot 10⁹-member cluster must collapse in map-side partials, never
    // land whole on one Window reducer. Checked STRUCTURALLY (ADVICE r15:
    // the previous rendered-line substring scan missed a window whose
    // partition key is an alias not containing "cluster"): walk the
    // optimized logical plan's Window nodes and transitively expand each
    // partitionSpec attribute through every Alias definition in the plan —
    // if any reachable origin attribute is the cluster id, fail. (The
    // upstream sorted-neighborhood generator's `_sn_pid` rank window is a
    // separate, legitimate contract and partitions on the block key.)
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    val plan = SparkEntry.queries("q_golden")(spark, dir)
      .queryExecution.optimizedPlan
    val aliasRefs = scala.collection.mutable.Map.empty[Long, (String, Set[Long])]
    val attrNames = scala.collection.mutable.Map.empty[Long, String]
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case a: Alias =>
          aliasRefs(a.exprId.id) =
            (a.name, a.child.references.map(_.exprId.id).toSet)
        case ar: AttributeReference => attrNames(ar.exprId.id) = ar.name
        case _ =>
      })
    }
    def reachableNames(start: Set[Long]): Set[String] = {
      val seen = scala.collection.mutable.Set.empty[Long]
      val out = scala.collection.mutable.Set.empty[String]
      var frontier = start
      while (frontier.nonEmpty) {
        val next = frontier.diff(seen)
        seen ++= next
        frontier = Set.empty
        next.foreach { id =>
          attrNames.get(id).foreach(out += _)
          aliasRefs.get(id).foreach { case (nm, refs) =>
            out += nm; frontier = frontier ++ refs
          }
        }
      }
      out.toSet
    }
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    for (w <- windows) {
      val partIds = w.partitionSpec.flatMap(_.references.map(_.exprId.id)).toSet
      val reach = reachableNames(partIds).map(_.toLowerCase)
      assert(!reach.contains("cluster_id"),
        s"q_golden must elect modes via min(struct), not a window over the " +
          s"cluster key — Window partitions on $reach:\n$w")
    }
  }

  test("linkage scoring joins records back by equi-join, no cartesian") {
    val p = planOf("q_linkage")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"q_linkage pair join-back must stay equi:\n${p.take(3000)}")
  }

  test("pageRank's final plan reads the checkpointed ranks, never the base tables") {
    val p = planOf("q_pagerank")
    // iterations ran eagerly behind localCheckpoint: the returned plan
    // must be a top-k over the checkpointed RDD — if lineitem's FileScan
    // (or any join) appears here, lineage truncation broke and every
    // downstream action would replay ten iterations
    assert(p.contains("ExistingRDD"), p.take(3000))
    assert(!p.contains("FileScan"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("session-5 eval stats: auc windows share one group shuffle; cuped is one agg pass") {
    // rocAuc = the mannWhitney shape: rank + tie windows and the final
    // aggregation all ride ONE group-key hash partitioning, no join
    val auc = planOf("q_auc")
    val aucEx = "(?<!Broadcast)Exchange".r.findAllIn(auc).size
    assert(aucEx <= 2, s"q_auc grew extra shuffles ($aucEx):\n${auc.take(2000)}")
    assert(!auc.contains("Join"), auc.take(2000))
    // cuped: per-customer pre-agg, a broadcast-able equi-join, then ONE
    // partial-aggregating pass — never a window, never a cartesian
    val cu = planOf("q_cuped")
    assert(!cu.contains("Window"), cu.take(2000))
    assert(!cu.contains("CartesianProduct"), cu.take(2000))
    // calibration: one full-data shuffle onto (group, bin) cells; the
    // ECE window runs over the ≤nBins cell relation after the agg
    val cal = planOf("q_calibration")
    val calEx = "(?<!Broadcast)Exchange".r.findAllIn(cal).size
    assert(calEx <= 3, s"q_calibration grew extra shuffles ($calEx):\n${cal.take(2000)}")
    assert(cal.contains("Window"), cal.take(2000))
  }

  test("ks test: cumulative windows run over the distinct-value cells, one group family") {
    val p = planOf("q_ks_test")
    // both the running-cumulative and the totals windows declare the
    // group hash partitioning; no join anywhere
    assert(p.contains("hashpartitioning(event_type"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    val ex = "(?<!Broadcast)Exchange".r.findAllIn(p).size
    assert(ex <= 3, s"q_ks_test grew extra shuffles ($ex):\n${p.take(2000)}")
  }

  test("gap fill: per-key grid join, fill window hash-partitioned by key") {
    val p = planOf("q_gap_fill")
    // the grid-to-cells join and the forward-fill window both key on the
    // group columns — a global (unpartitioned) window here would be the
    // 100 TB failure mode
    assert(p.contains("hashpartitioning(event_type"), p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
  }

  test("item pairs: basket-keyed self-join, stats sides broadcast, no cartesian") {
    val p = planOf("q_item_pairs")
    assert(!p.contains("CartesianProduct"), p.take(2500))
    // the item-frequency and basket-count relations ride broadcasts;
    // only the pair self-join + its aggregation shuffle the data
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2500))
    assert(p.contains("hashpartitioning(basket"), p.take(2500))
  }

  test("triangle counting: every join is an equi-join (closure probe included)") {
    val p = planOf("q_triangles")
    // the orientation OR-predicate failure mode would plan a
    // BroadcastNestedLoopJoin or CartesianProduct — the canonical
    // (least, greatest) probe key keeps everything hash-joinable
    assert(!p.contains("CartesianProduct"), p.take(2500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2500))
  }

  test("spearman: rank windows share the group partitioning; one agg pass after") {
    val p = planOf("q_spearman")
    assert(p.contains("hashpartitioning(s_nationkey"), p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    // supplier dim broadcasts into the lineitem scan side
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
  }

  test("bfs: the final plan reads the checkpointed depths, never the base tables") {
    val plan = SparkEntry.queries("q_bfs")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD"), plan.take(1500))
    assert(!plan.toLowerCase.contains("parquet"), plan.take(1500))
  }

  test("session-6 cell reports: heavy hitters / pr curve / cusum window the REDUCED cells") {
    // each is agg-to-cells then windows over the cell relation — the raw
    // table shuffles once (into the hash agg); the windows add at most
    // one group exchange; nothing cartesians.
    for (q <- Seq("q_heavy_hitters", "q_pr_curve", "q_cusum")) {
      val p = planOf(q)
      assert(p.contains("HashAggregate"), s"$q lost its cell aggregation:\n${p.take(1500)}")
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(1500)}")
      val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).size
      assert(exchanges <= 3, s"$q: expected ≤3 exchanges, saw $exchanges:\n${p.take(2000)}")
    }
  }

  test("session-7 diagnostics: skew/benford/js/fd aggregate cells, never cartesian raw rows") {
    // skew report: ONE stacked scan of lineitem feeds the cell agg (the
    // generator is a projection, not three scans); the rank window runs
    // over the reduced cells.
    val sk = planOf("q_skew_report")
    assert(sk.contains("HashAggregate"), sk.take(1500))
    assert("FileScan parquet".r.findAllIn(sk).size == 1,
      s"skew report should scan lineitem once:\n${sk.take(2000)}")
    // js divergence mirrors drift: cell agg + bin-completion join, no
    // window anywhere.
    val js = planOf("q_js_divergence")
    assert(js.contains("HashAggregate") && !js.contains("Window"),
      js.take(1500))
    // benford's only join partners are the 9-digit frame and the 1-row
    // total — any non-broadcast join of raw rows is a regression.
    val bf = planOf("q_benford")
    assert(!bf.contains("SortMergeJoin"), bf.take(1500))
    // fd pairs: count-distinct expands to the standard two-level hash
    // aggregation; no window, no cartesian.
    val fd = planOf("q_fd_check")
    assert(fd.contains("HashAggregate") && !fd.contains("Window") &&
      !fd.contains("CartesianProduct"), fd.take(1500))
  }

  test("link prediction: wedge and closure joins are all equi-joins") {
    val p = planOf("q_link_pred")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("curriculum: source-keyed rank windows; stage offsets ride a broadcast join") {
    val p = planOf("q_curriculum")
    assert(p.contains("BroadcastHashJoin"),
      s"stage offsets should broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(p.contains("hashpartitioning(source"),
      s"per-source windows should partition by source:\n${p.take(2000)}")
  }

  test("blocking eval: summary is single-row broadcast composition, truth join keyed") {
    val p = planOf("q_blocking_eval")
    // the pair intersection must stay an equi-join; the only nested-loop
    // joins are the 1-row aggregate cross joins by construction
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("HashAggregate"), p.take(1500))
  }

  test("acf/ccf: the lag window and moment agg share one key shuffle") {
    for (q <- Seq("q_acf", "q_ccf")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(1500)}")
      // group-keyed partitioning feeds window AND agg — exactly one
      // hashpartitioning family on the key column
      val key = if (q == "q_acf") "o_orderpriority" else "cohort"
      assert(p.contains(s"hashpartitioning($key"),
        s"$q should partition by $key:\n${p.take(2000)}")
    }
  }

  test("pair statistics (kendall/theil-sen/mann-kendall): group-keyed equi-join, no cartesian") {
    for (q <- Seq("q_kendall", "q_theil_sen", "q_mann_kendall")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(1500)}")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q pair join must stay keyed:\n${p.take(1500)}")
    }
  }

  test("inclusion deps: one value-keyed aggregation; pair verdicts off the mask relation") {
    val p = planOf("q_inclusion_deps")
    assert(p.contains("hashpartitioning(_id_v"),
      s"value-keyed mask fold lost:\n${p.take(2000)}")
    // the attr-pair expansion is a tiny literal-relation nested loop by
    // construction — but the DATA side must never cartesian
    assert(p.contains("HashAggregate"), p.take(1500))
  }

  test("recommendations: every data join is keyed; top-k windows partition by basket") {
    val p = planOf("q_recommend")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("hashpartitioning(basket"),
      s"per-user ranking should partition by basket:\n${p.take(2000)}")
  }

  test("remove-top: the projection is scan-shaped (no join back to the corpus)") {
    val p = planOf("q_remove_top")
    // v rides as a literal: no join operator of any kind in the final
    // projection plan (the solve already ran at construction time)
    assert(!p.contains("Join"), s"v must be a literal, not a join:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("session-6 k-arm tests: rank/median windows and the arm agg share one group shuffle") {
    // kruskal/anova/brown-forsythe are the mannWhitney shape — a group-
    // (or arm-)keyed window feeding hash aggregations, never a join
    for (q <- Seq("q_kruskal", "q_anova", "q_brown_forsythe")) {
      val p = planOf(q)
      assert(!p.contains("Join"), s"$q must be window+agg only:\n${p.take(1500)}")
      val key = if (q == "q_kruskal") "cohort" else "event_type"
      assert(p.contains(s"hashpartitioning($key"),
        s"$q should partition by $key:\n${p.take(2000)}")
    }
  }

  test("session-6 fim rewrite is a pure projection (no exchange beyond the output sort)") {
    val p = planOf("q_fim")
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"fim should be scan→project→sort, saw $exchanges exchanges:\n${p.take(1500)}")
    assert(!p.contains("Join"), p.take(1500))
  }

  test("session-6 concentration: hhi is agg-only (the mergeable twin); gini windows the group key") {
    val pHhi = planOf("q_hhi")
    assert(!pHhi.contains("Window"), s"hhi must not sort:\n${pHhi.take(1500)}")
    assert(!pHhi.contains("Join"), pHhi.take(1500))
    val pGini = planOf("q_gini")
    assert(pGini.contains("hashpartitioning(lang"),
      s"gini rank window should partition by lang:\n${pGini.take(2000)}")
    assert(!pGini.contains("Join"), pGini.take(1500))
  }

  test("session-6 ranking metrics: position windows and the metric agg share the query-group shuffle") {
    val p = planOf("q_ranking_metrics")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("hashpartitioning(event_type"),
      s"windows should partition by event_type:\n${p.take(2000)}")
    // the per-user relevance side is tiny and must ride a broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("session-6 zipf: vocab-sized rank window, moment agg off the vocab relation") {
    val p = planOf("q_zipf")
    assert(!p.contains("Join"), p.take(1500))
    assert(p.contains("hashpartitioning(lang"),
      s"rank window should partition by lang:\n${p.take(2000)}")
  }

  test("session-6 iterative ops (bradley-terry/harmonic) read their checkpointed relations") {
    for (q <- Seq("q_bradley_terry", "q_harmonic")) {
      val p = planOf(q)
      assert(p.contains("Scan ExistingRDD"),
        s"$q final plan should read the checkpointed iteration output:\n${p.take(1500)}")
      assert(!p.contains("CartesianProduct"), p.take(1500))
    }
  }

  test("session-6 conformal/mde/subclass-ate: broadcast stat relations, reducing aggs, no cartesian") {
    val pc = planOf("q_conformal")
    assert(pc.contains("BroadcastHashJoin"),
      s"q̂ relation must broadcast:\n${pc.take(2000)}")
    assert(!pc.contains("CartesianProduct"), pc.take(1500))
    val pm = planOf("q_mde")
    assert(!pm.contains("Join") && !pm.contains("Window"),
      s"mde must be agg-only:\n${pm.take(1500)}")
    val ps = planOf("q_subclass_ate")
    assert(!ps.contains("Join"), ps.take(1500))
    assert(ps.contains("hashpartitioning(event_type"),
      s"strata window should partition by event_type:\n${ps.take(2000)}")
  }

  test("session-6 centroid/novelty: keyed joins only, small sides broadcast") {
    for (q <- Seq("q_centroid_sim", "q_centroid_outliers", "q_novelty")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(1500)}")
      assert(p.contains("BroadcastHashJoin"),
        s"$q should broadcast its small side:\n${p.take(2000)}")
    }
  }

  test("round-10 dict tag: one automaton pass + broadcast spelling restore") {
    // Round 12: the caller's-spelling restore adds exactly ONE join — a
    // BroadcastHashJoin whose build side is the |dictionary|-row
    // normalized→original mapping. The corpus side must still never
    // shuffle for a join (no sort-merge/shuffled-hash).
    val p = planOf("q_dict_tag")
    assert(p.contains("Generate"), s"lost the explode:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"),
      s"spelling restore should broadcast the mapping:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"dictionary tagging must not shuffle-join the corpus:\n${p.take(1500)}")
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).size
    assert(exchanges <= 2,
      s"scan→generate→agg→sort should shuffle ≤2×, saw $exchanges:\n${p.take(1500)}")
  }

  test("round-10 interval overlap: equi-join on the bin key, never a cartesian") {
    val p = planOf("q_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"interval overlap degraded to a product:\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected a keyed join:\n${p.take(1500)}")
  }

  test("round-10 bpe encode: trained-model application is scan-shaped (no join)") {
    // training runs BEFORE plan build (the collected model bakes into the
    // bpe_tokens literal); the encode plan itself reads the corpus once
    val p = planOf("q_bpe_encode")
    assert(!p.contains("Join"), s"encode must not join:\n${p.take(1500)}")
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"scan→project→sort should shuffle ≤1×, saw $exchanges:\n${p.take(1500)}")
  }

  test("round-10 skip-gram: keyed count join, zip-slice windows — no cartesian") {
    // the only nested-loop is the 1-row N broadcast (the folded-constant
    // pattern); the vocabulary join must stay keyed and the window pairs
    // come from zip-slice projections, never a positional self-join
    val p = planOf("q_skipgram")
    assert(!p.contains("CartesianProduct"), s"skipgram planned a product:\n${p.take(2000)}")
    assert(p.contains("Generate"), s"lost the explode:\n${p.take(1500)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected a keyed vocab join:\n${p.take(2000)}")
  }

  test("round-10 heaps: corpus side is two hash aggs; windows only over checkpoint rows") {
    // the data-width stages are hash aggregations; the only nested loops
    // are the 2-scalar bounds broadcast and the 1-row fit broadcast
    val p = planOf("q_heaps")
    assert(!p.contains("CartesianProduct"), s"heaps planned a product:\n${p.take(2000)}")
    assert(p.contains("HashAggregate"), s"lost the hash aggs:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      s"checkpoint-row joins must stay broadcast-sized:\n${p.take(2000)}")
  }

  test("round-10 bleu: (pair, n, gram) equi-join only — no cartesian, no window") {
    val p = planOf("q_bleu")
    assert(!p.contains("CartesianProduct"), s"bleu planned a product:\n${p.take(2000)}")
    assert(!p.contains("NestedLoop"), s"bleu planned a nested loop:\n${p.take(2000)}")
    assert(p.contains("Generate"), s"lost the gram explode:\n${p.take(1500)}")
    assert(!p.contains("Window"), s"bleu needs no window:\n${p.take(1500)}")
  }

  test("no nondeterministic expressions beyond the two audited sites (task-retry safety)") {
    // On a real cluster, a fetch failure retries tasks; an expression
    // that evaluates differently per attempt (rand, uuid, input_file,
    // unseeded sampling) silently corrupts results at 100 TB unless the
    // stage is marked indeterminate. The repo's stance is seeded-hash
    // determinism everywhere; exactly two nondeterministic primitives
    // are in audited use, both with engine-level retry protection
    // (Spark wholly re-runs indeterminate stages, SPARK-23207):
    //   - monotonically_increasing_id as a TRANSIENT per-row group key
    //     inside one plan (Similarity.assignCellsJoined);
    //   - spark_partition_id over a deterministic range partitioning
    //     (Dedup.sortedNeighborhoodPairs rank build).
    // This contract walks every registered query's analyzed plan and
    // fails if any OTHER nondeterministic expression class appears —
    // new nondeterminism must be an explicit, audited decision.
    // Streaming replays are skipped: their builders execute the replay
    // eagerly (their determinism is pinned by the twin/restart specs).
    val allowed = Set("MonotonicallyIncreasingID", "SparkPartitionID")
    val offenders = scala.collection.mutable.SortedMap.empty[String, Set[String]]
    for ((name, fn) <- SparkEntry.queries if !name.startsWith("q_stream_")) {
      val analyzed = fn(spark, dir).queryExecution.analyzed
      // collectWithSubqueries descends into SubqueryExpression plans too
      // (IN/EXISTS/scalar subqueries) — a plain collect over node
      // expressions would let a rand() inside a subquery pass silently
      // (ADVICE r14).
      val nondet = analyzed.collectWithSubqueries { case node =>
        node.expressions.flatMap(_.collect {
          // root causes only: wrappers (Alias, arithmetic over a
          // nondeterministic child) inherit the flag transitively
          case e if !e.deterministic && e.children.forall(_.deterministic) =>
            e.getClass.getSimpleName
        })
      }.flatten.toSet
      val extra = nondet -- allowed
      if (extra.nonEmpty) offenders(name) = extra
    }
    assert(offenders.isEmpty,
      s"unaudited nondeterministic expressions: $offenders")
  }

  test("iterative job-count contracts: hits and pageRank stay inside their job budgets") {
    // r14 attribution: with session AQE re-planning inside the iterate,
    // ONE q_hits run submitted 72 jobs (every query stage its own job)
    // vs 36 with AQE off around the loop — the per-job scheduling floor,
    // not data volume, dominates graph-sized iterates, so the job COUNT
    // is the observable that regresses first if the AQE-off wrapper, the
    // bipartite prologue, or an eager-checkpoint cadence is lost. Counts
    // are a function of code + conf, not of scale (actions: counts,
    // per-iteration checkpoints, the final collect), so they are pinned
    // here at sf0.001 with ~1.5x headroom for scheduler drift; suites run
    // sequentially in the forked test JVM, so no foreign jobs land in the
    // listener window.
    val sc = spark.sparkContext
    def cleanSlate(): Unit = {
      spark.catalog.clearCache()
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    def runQ(q: String): Unit =
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
    // Deterministic drain without listener-bus internals (ADVICE r14: a
    // fixed sleep could flake either way on a loaded host): after f, a
    // MARKER job is submitted and its JobStart awaited — the bus is FIFO
    // per listener, so every earlier start has been counted by then.
    val markerDesc = "__graft_plan_contract_marker__"
    def countJobs(f: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val marker = new java.util.concurrent.CountDownLatch(1)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
          if (desc.contains(markerDesc)) marker.countDown()
          else { n.incrementAndGet(); () }
        }
      }
      sc.addSparkListener(l)
      try {
        f
        sc.setJobDescription(markerDesc)
        try sc.parallelize(1 to 1, 1).count()
        finally sc.setJobDescription(null)
        // 120 s: listener-bus delivery lags behind a deep event backlog
        // on a contended box (the r18 driver test pass's failure class) —
        // the deadline bounds a dead bus, it must not race a busy one.
        assert(marker.await(120, java.util.concurrent.TimeUnit.SECONDS),
          "listener bus did not deliver the marker job within 120 s")
      } finally sc.removeSparkListener(l)
      n.get
    }
    // Budgets pinned for the TEN highest-job-count queries of the full
    // JobCountSweep census (sf0.001, this harness's local[4] conf —
    // the sweep reproduced this test's q_hits 32 / q_pagerank 43
    // exactly; the committed round-over-round census is JOBS.json),
    // plus the queries driver passes showed most ambient-inflated.
    // Budgets are ~1.5x measured so the 2x regression mode (AQE
    // re-planning inside a loop, a reintroduced driver-side CC
    // iterator, a lost eager checkpoint) fails loudly while scheduler
    // drift does not. Note budgets are conf-pinned to this spec's
    // local[4] session (shuffle.partitions=4). "measured" = r17 census
    // (post CC labels-materialization: every local-path CC consumer pays
    // exactly one extra single-task job for the once-only union-find)
    // unless noted.
    for ((q, budget) <- Seq(
        "q_bradley_terry" -> 75, // measured 50 (was 58 pre r15 step fusion)
        "q_orphans" -> 39, // measured 26 (r18 stacked single-pass)
        "q_ktruss" -> 24, // measured 16 (r18 AQE-off peeling loop)
        "q_pagerank" -> 65, // measured 43
        "q_dedup_against_near" -> 51, // measured 34
        "q_harmonic" -> 47, // measured 31 (r18 lazy visited union)
        "q_bfs" -> 50, // measured 33
        "q_hits" -> 50, // measured 32
        "q_pagerank_weighted" -> 47, // measured 31
        "q_ppr" -> 45, // measured 30
        "q_dedup_best_rep" -> 33, // measured 23 (was 32 pre-fusion)
        "q_safe_split" -> 29, // measured 20 (was 29 pre-fusion)
        "q_containment" -> 23, // measured 15
        // the other CC consumers: a reintroduced driver-side iterator
        // would push each up by ~9 sequential fetch jobs; a lost labels
        // materialization re-runs union-find per consumption (the r16
        // q_golden residual) without moving these counts, so the
        // LogicalRDD-leaf contract in CcEdgeCheckpointSpec guards that
        "q_golden" -> 39, // measured 23 (single-pass goldenRecords)
        "q_er_clusters" -> 26, // measured 18
        "q_dedup_clusters" -> 24, // measured 17
        "q_dedup_corpus" -> 30, // measured 20 (r16 verdict item #3: the
        // pre-attributed rising idle cell of the r16 pass)
        // the r15 driver pass's residual-variance leaders (verdict r15
        // item #2): their idle walls are fine (0.3-2.5 s) and their
        // driver inflation was attributed to adjacency-clustered
        // contention bursts (NOTES r18), but the count is the exposure
        // metric, so pin it — a fan-out regression (lost distinct-
        // shingle build, a second quantize pass, an exploded bin join)
        // shows up here first
        "q_dedup_minhash_lsh" -> 21, // measured 14
        "q_int8_quant" -> 9, // measured 6
        "q_interval_overlap" -> 8)) { // measured 5
      runQ(q) // warm-up: one-time memoizer/JIT jobs land outside the count
      cleanSlate()
      val jobs = countJobs(runQ(q))
      info(s"$q submitted $jobs jobs (budget $budget)")
      assert(jobs <= budget,
        s"$q submitted $jobs jobs — over its $budget budget; the r14 " +
          "failure mode is AQE re-planning inside the loop (job count ~2x)")
      cleanSlate()
    }
  }
}
