package graft.graph

import graft.SparkSpec

import org.apache.spark.sql.functions._

import scala.util.Random

/** Random-graph differentials for the degree-ordered wedge-join family
  * (triangleCounts / kTruss / linkPrediction) and multi-source BFS —
  * the round-12 pattern (connectedComponents vs BFS fuzz) extended to
  * the operators whose O(|E|^1.5) wedge machinery is subtlest: each op
  * runs on Erdős–Rényi-ish graphs with orientation noise (random edge
  * direction, duplicates, self-loops) and must equal a brute-force
  * adjacency-set reference computed in plain Scala.
  */
class GraphFuzzSpec extends SparkSpec {
  import spark.implicits._

  /** Random undirected edge set + a noisy directed presentation of it
    * (random orientation, duplicated edges, self-loops) — the input
    * conventions all four ops document.
    */
  private def randomGraph(rnd: Random, n: Int, p: Double)
      : (Set[(Long, Long)], Seq[(Long, Long)]) = {
    val und = (for {
      a <- 0 until n; b <- (a + 1) until n
      if rnd.nextDouble() < p
    } yield (a.toLong, b.toLong)).toSet
    val noisy = und.toSeq.flatMap { case (a, b) =>
      val base = if (rnd.nextBoolean()) Seq((a, b)) else Seq((b, a))
      if (rnd.nextInt(4) == 0) base :+ base.head else base // duplicates
    } ++ (0 until n / 5).map(i => (i.toLong, i.toLong))     // self-loops
    (und, noisy)
  }

  private def adjacency(und: Set[(Long, Long)]): Map[Long, Set[Long]] =
    und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  test("triangleCounts matches a brute-force adjacency reference on random graphs") {
    for (seed <- Seq(5, 23, 71)) {
      val rnd = new Random(seed)
      val (und, noisy) = randomGraph(rnd, 30, 0.18)
      val adj = adjacency(und)
      val expected = adj.map { case (v, ns) =>
        val deg = ns.size.toLong
        val tri = ns.toSeq.flatMap(x => ns.map(y => (x, y)))
          .count { case (x, y) => x < y && adj(x).contains(y) }.toLong
        val lcc = if (deg >= 2) (2L * tri * 1000000L) / (deg * (deg - 1L)) else 0L
        (v, deg, tri, lcc)
      }.toSet
      val got = GraphOps.triangleCounts(noisy.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"triangleCounts mismatch at seed $seed")
    }
  }

  test("kTruss matches a naive support-peeling reference on random graphs") {
    for (seed <- Seq(9, 42, 88); k <- Seq(3, 4)) {
      val rnd = new Random(seed)
      val (und, noisy) = randomGraph(rnd, 26, 0.22)
      // naive fixed-round peeling: support = |N(a) ∩ N(b)| within the
      // CURRENT edge set; drop support < k-2; report support on the
      // final set (0 for never-triangled survivors — none survive a
      // round, but the left-join contract says coalesce to 0).
      def support(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
        val adj = adjacency(es)
        es.map { case (a, b) =>
          (a, b) -> adj(a).intersect(adj(b)).size.toLong }.toMap
      }
      var cur = und
      for (_ <- 1 to 3)
        cur = { val s = support(cur); cur.filter(e => s(e) >= k - 2) }
      val fin = support(cur)
      val expected = cur.map(e => (e._1, e._2, fin(e))).toSet
      val got = GraphOps.kTruss(noisy.toDF("src", "dst"), k = k, rounds = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"kTruss mismatch at seed $seed k=$k")
    }
  }

  test("linkPrediction matches a naive common-neighbor reference on random graphs") {
    for (seed <- Seq(13, 37, 61)) {
      val rnd = new Random(seed)
      val (und, noisy) = randomGraph(rnd, 28, 0.2)
      val adj = adjacency(und)
      val nodes = adj.keySet.toSeq
      val expected = (for {
        u <- nodes; v <- nodes
        if u < v && !adj(u).contains(v)
        common = adj(u).intersect(adj(v))
        if common.size >= 2
      } yield {
        val c = common.size.toLong
        val aa = common.toSeq.map { z =>
          val lnMicro = math.round(math.log(adj(z).size.toDouble) * 1e6)
          1000000000000L / lnMicro
        }.sum
        val jac = c * 1000000L / (adj(u).size + adj(v).size - c)
        (u, v, c, jac, aa)
      }).toSet
      val got = GraphOps.linkPrediction(noisy.toDF("src", "dst"), minCommon = 2L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == expected, s"linkPrediction mismatch at seed $seed")
    }
  }

  test("bfsDepths matches a naive multi-source BFS on random directed graphs") {
    for (seed <- Seq(4, 19, 55)) {
      val rnd = new Random(seed)
      val n = 30
      val directed = (for {
        a <- 0 until n; b <- 0 until n
        if a != b && rnd.nextDouble() < 0.08
      } yield (a.toLong, b.toLong)).toSet
      val out = directed.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val seeds = (0 until n).filter(_ => rnd.nextInt(8) == 0).map(_.toLong) match {
        case s if s.nonEmpty => s
        case _ => Seq(0L)
      }
      val rounds = 5
      // naive synchronous relaxation to the horizon
      var depth = seeds.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        val next = depth.toSeq.flatMap { case (u, d) =>
          out.getOrElse(u, Set.empty).map(_ -> (d + 1L)) }
        depth = (depth.toSeq ++ next).groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).min }
      }
      val expected = depth.toSet
      val got = GraphOps.bfsDepths(directed.toSeq.toDF("src", "dst"),
          seeds.toDF("node"), rounds = rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"bfsDepths mismatch at seed $seed")
    }
  }
}
