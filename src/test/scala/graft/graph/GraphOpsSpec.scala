package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = GraphOps.RankScale

  test("pageRank: symmetric two-node graph splits rank evenly") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = GraphOps.pageRank(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    // total mass conserved up to per-node floor truncation (< iters units)
    assert(math.abs(out.values.sum - Scale) < 1000L)
  }

  test("pageRank: star graph ranks the hub above the leaves") {
    // undirected star: hub 0 <-> leaves 1..5
    val pairs = (1L to 5L).map(l => (0L, l))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val out = GraphOps.pageRank(edges, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(l => out(0L) > out(l)))
    // leaves are symmetric — identical rank, exactly
    assert((2L to 5L).forall(l => out(l) == out(1L)))
  }

  test("pageRank: dangling node keeps its mass via the self-loop (no leak)") {
    // 1 -> 2, 2 has no out-edge: operator adds 2 -> 2
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = GraphOps.pageRank(edges, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) > out(1L)) // sink accumulates
    assert(math.abs(out.values.sum - Scale) < 1000L)
  }

  test("weighted pageRank: all-1 weights equal the unweighted form exactly") {
    val pairs = (1L to 20L).flatMap(i => Seq((i, i % 5 + 50L), (i % 5 + 50L, i)))
    val unw = GraphOps.pageRank(pairs.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w1 = GraphOps.pageRank(
        pairs.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
        iters = 4, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unw == w1)
  }

  test("weighted pageRank: out-mass follows the weights; parallel edges sum") {
    // node 1 points at 2 (weight 9) and 3 (weight 1): 2 must outrank 3
    val edges = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val out = GraphOps.pageRank(edges, iters = 6, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) > out(3L))
    // parallel edges collapse by SUMMING weights: 9 as one edge ==
    // 9 parallel unit edges
    val parallel = (Seq((1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)) ++
        Seq.fill(9)((1L, 2L, 1L))).toDF("src", "dst", "w")
    val out2 = GraphOps.pageRank(parallel, iters = 6, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == out)
  }

  test("pageRank is deterministic under repartitioning and duplicate edges") {
    val pairs = (1L to 30L).flatMap(i => Seq((i, i % 7 + 100L), (i % 7 + 100L, i)))
    val edges = pairs.toDF("src", "dst")
    val a = GraphOps.pageRank(edges.repartition(1), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pageRank(edges.union(edges).repartition(11), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("labelPropagation: disjoint triangles each collapse to their min label") {
    // In one iteration every triangle node sees three distinct labels
    // (two neighbors + self) — all tied at count 1 — and the min-label
    // tie-break elects the triangle's smallest id for all three.
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
    val edges = (tri ++ tri.map(_.swap)).toDF("src", "dst")
    val out = GraphOps.labelPropagation(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(out(_) == 1L))
    assert(Seq(4L, 5L, 6L).forall(out(_) == 4L))
  }

  test("labelPropagation: labels never cross connected components") {
    val compA = (1L to 10L).map(i => (i, i % 10 + 1))
    val compB = (101L to 110L).map(i => (i, (i - 100L) % 10 + 101L))
    val all = compA ++ compB
    val edges = (all ++ all.map(_.swap)).toDF("src", "dst")
    val out = GraphOps.labelPropagation(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.filter(_._1 <= 100L).values.forall(_ <= 100L))
    assert(out.filter(_._1 > 100L).values.forall(_ > 100L))
  }

  test("labelPropagation is deterministic under repartitioning and duplicate edges") {
    val pairs = (1L to 30L).flatMap(i => Seq((i, i % 7 + 100L), (i % 7 + 100L, i)))
    val edges = pairs.toDF("src", "dst")
    val a = GraphOps.labelPropagation(edges.repartition(1), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.labelPropagation(edges.union(edges).repartition(11), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
