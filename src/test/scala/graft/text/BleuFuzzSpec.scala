package graft.text

import scala.util.Random

import graft.SparkSpec

/** Randomized differential for corpus BLEU against an independent local
  * fold: per-pair clipped n-gram matches (multiplicity, not the
  * distinct-shingle rule), corpus-summed precisions, the exact
  * ceil-division brevity penalty, and the all-positive log gate. A tiny
  * vocabulary forces real clipping (candidates repeat grams more often
  * than their references) and empty candidates exercise the NULL
  * contracts. Seeds are pinned so every trial reproduces.
  */
class BleuFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def roundLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private val words = IndexedSeq("aa", "bb", "cc")
  private def text(rnd: Random, maxWords: Int): String =
    (0 until rnd.nextInt(maxWords + 1))
      .map(_ => words(rnd.nextInt(words.size))).mkString(" ")

  test("fuzz: bleuCorpus matches a local clipped-precision fold") {
    for (trial <- 0 until 3) {
      val rnd = new Random(13800 + trial)
      val maxN = 1 + rnd.nextInt(4)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        (0 until 1 + rnd.nextInt(6)).map { p =>
          (s"g$g", s"p$g-$p", text(rnd, 10), text(rnd, 10))
        }
      }
      val df = rnd.shuffle(rows).toDF("grp", "pid", "cand", "ref")
        .repartition(1 + rnd.nextInt(4))
      val got = TextAnalysis.bleuCorpus(df, "grp", "pid", "cand", "ref", maxN)
        .collect()
        .map { r =>
          val fixed = (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3))
          val mts = (0 until 2 * maxN).map(i => r.getLong(4 + i)).toVector
          val bpIdx = 4 + 2 * maxN
          (fixed, mts,
            if (r.isNullAt(bpIdx)) None else Some(r.getLong(bpIdx)),
            if (r.isNullAt(bpIdx + 1)) None else Some(r.getLong(bpIdx + 1)))
        }
        .toSet
      def toks(s: String) = s.split(" ", -1).filter(_.nonEmpty).toVector
      def grams(ts: Vector[String], n: Int): Map[String, Long] =
        if (ts.size < n) Map.empty
        else ts.sliding(n).map(_.mkString(" ")).toVector
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = rows.groupBy(_._1).map { case (g, ps) =>
        val c = ps.map(p => toks(p._3).size.toLong).sum
        val r = ps.map(p => toks(p._4).size.toLong).sum
        val mts = (1 to maxN).flatMap { n =>
          val (m, t) = ps.map { p =>
            val cg = grams(toks(p._3), n)
            val rg = grams(toks(p._4), n)
            (cg.map { case (gr, cc) => math.min(cc, rg.getOrElse(gr, 0L)) }.sum,
              cg.values.sum)
          }.unzip match { case (ms, ts2) => (ms.sum, ts2.sum) }
          Seq(m, t)
        }.toVector
        val bp = if (c == 0L) None
          else if (c >= r) Some(0L)
          else Some(-(((r - c) * 1000000L + c - 1) / c))
        val ms = (0 until maxN).map(i => mts(2 * i))
        val bleu = if (c > 0L && ms.forall(_ > 0L)) {
          val sumQ = (0 until maxN).map { i =>
            roundLong(math.log(
              mts(2 * i).toDouble / mts(2 * i + 1).toDouble) * 1e6)
          }.sum
          Some(bp.get + math.floor(sumQ.toDouble / maxN.toDouble).toLong)
        } else None
        ((g, ps.size.toLong, c, r), mts, bp, bleu)
      }.toSet
      assert(got == want, s"trial $trial (maxN=$maxN): " +
        s"diff=${(got diff want).take(2)} / ${(want diff got).take(2)}")
    }
  }
}
