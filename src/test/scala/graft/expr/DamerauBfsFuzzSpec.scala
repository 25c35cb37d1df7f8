package graft.expr

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** Exact-value differential for the unrestricted Damerau–Levenshtein
  * expression against a bidirectional BFS over the literal edit graph —
  * an INDEPENDENT reference that shares nothing with the Lowrance–Wagner
  * matrix: states are whole strings, edges are single edits (insert,
  * delete, substitute, adjacent transpose), and the distance is the
  * shortest path. The existing ExpressionsSpec fuzz pins metric AXIOMS;
  * this pins the VALUES, including the transposition-then-edit
  * interactions that distinguish unrestricted Damerau from OSA
  * (a small alphabet forces them constantly). Strings stay short
  * (≤ 5 over {a,b,c}) so the BFS frontier stays bounded; any optimal
  * sequence over such strings never benefits from characters outside
  * the alphabet, so neighbor generation over {a,b,c} is complete.
  */
class DamerauBfsFuzzSpec extends SparkSpec {

  private val alphabet = "abc"

  private def neighbors(s: String): Set[String] = {
    val out = Set.newBuilder[String]
    for (i <- 0 until s.length) // delete
      out += s.substring(0, i) + s.substring(i + 1)
    for (i <- 0 to s.length; c <- alphabet) // insert
      out += s.substring(0, i) + c + s.substring(i)
    for (i <- 0 until s.length; c <- alphabet if c != s(i)) // substitute
      out += s.substring(0, i) + c + s.substring(i + 1)
    for (i <- 0 until s.length - 1 if s(i) != s(i + 1)) // transpose
      out += s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2)
    out.result()
  }

  /** Shortest edit path by bidirectional BFS, expanding the smaller
    * frontier; the first visited-set intersection is the exact distance
    * (unit edges, level-complete frontiers).
    */
  private def bfsDist(a: String, b: String): Long = {
    if (a == b) return 0L
    var fa = Set(a); var va = Set(a)
    var fb = Set(b); var vb = Set(b)
    var d = 0L
    while (true) {
      if (fa.size <= fb.size) {
        fa = fa.flatMap(neighbors) -- va
        va ++= fa
      } else {
        fb = fb.flatMap(neighbors) -- vb
        vb ++= fb
      }
      d += 1
      if ((fa & vb).nonEmpty || (fb & va).nonEmpty) return d
    }
    d // unreachable
  }

  test("fuzz: damerau_levenshtein matches a bidirectional BFS edit search") {
    val rnd = new Random(9600)
    def word(maxLen: Int) =
      (0 until rnd.nextInt(maxLen + 1))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def dl(a: String, b: String): Long =
      DamerauLevenshtein.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // the canonical unrestricted-vs-OSA witness stays pinned
    assert(dl("ca", "abc") == 2L && bfsDist("ca", "abc") == 2L)
    for (trial <- 0 until 60) {
      val (a, b) =
        if (trial % 3 == 0) {
          // transposition-heavy: scramble by adjacent swaps + one edit
          val base = word(5)
          val arr = base.toCharArray
          for (_ <- 0 until rnd.nextInt(3) if arr.length >= 2) {
            val i = rnd.nextInt(arr.length - 1)
            val t = arr(i); arr(i) = arr(i + 1); arr(i + 1) = t
          }
          (base, new String(arr))
        } else (word(5), word(5))
      assert(dl(a, b) == bfsDist(a, b),
        s"trial $trial: dl('$a','$b')=${dl(a, b)} bfs=${bfsDist(a, b)}")
    }
  }
}
