package graft.text

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differentials for the calibration/allocation half of the
  * corpus-assembly family against independent local folds: integer
  * percent-rank (rank ties, nulls-first), cross-group quantile
  * normalization (the pooled-position div arithmetic), the stratified
  * curriculum's band/interleave/global-position chain, Neyman allocation
  * (cents variance → micro-floored sigma → floor-div budget split),
  * power-of-two padding waste, DSIR hashed-unigram importance weights,
  * stratified hash sampling, and deterministic shard addressing. Seeds
  * are pinned so every trial reproduces.
  */
class AssemblyFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h16(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(4), 16)

  private def roundLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private val words = IndexedSeq("aa", "bb", "cc", "dd", "ee", "ff")
  private def text(rnd: Random, maxWords: Int): String =
    (0 until rnd.nextInt(maxWords + 1))
      .map(_ => words(rnd.nextInt(words.size))).mkString(" ")

  test("fuzz: rankNormalize matches a local rank-tie fold with nulls first") {
    for (trial <- 0 until 3) {
      val rnd = new Random(11500 + trial)
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { g =>
        (0 until 1 + rnd.nextInt(20)).map { i =>
          val v: java.lang.Long =
            if (rnd.nextInt(8) == 0) null else rnd.nextInt(6).toLong // ties
          (s"g$g", s"d$g-$i", v)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "id", "v")
        .repartition(1 + rnd.nextInt(4))
      val got = CorpusAssembly.rankNormalize(df, Seq("g"), "v")
        .collect()
        .map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val n = rs.size.toLong
        // rank() with nulls first: 1 + strictly-preceding row count
        def key(v: java.lang.Long): (Int, Long) =
          if (v == null) (0, 0L) else (1, v.longValue)
        rs.map { case (g, id, v) =>
          val rank = 1L + rs.count(o =>
            implicitly[Ordering[(Int, Long)]].lt(key(o._3), key(v)))
          val pct = if (n > 1)
            math.floor(((rank - 1) * 1000000L).toDouble / (n - 1).toDouble)
              .toLong
          else 0L
          (g, id, Option(v).map(_.longValue), pct)
        }
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("fuzz: quantileNormalize matches a local pooled-position fold") {
    for (trial <- 0 until 3) {
      val rnd = new Random(11600 + trial)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { g =>
        (0 until 1 + rnd.nextInt(15)).map { i =>
          (s"g$g", s"d$g-$i", (rnd.nextInt(200) - 100).toLong)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "id", "v")
        .repartition(1 + rnd.nextInt(4))
      val got = CorpusAssembly.quantileNormalize(df, Seq("g"), "id", "v")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
        .toSet
      val pooled = rows.map(_._3).sorted.toVector
      val bigN = rows.size.toLong
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val n = rs.size.toLong
        val ordered = rs.sortBy(r => (r._3, r._2))
        ordered.zipWithIndex.map { case ((g, id, v), i) =>
          val idx = ((i + 1) * bigN + n - 1) / n // 1-based pooled position
          (g, id, v, pooled((idx - 1).toInt))
        }
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("fuzz: curriculumOrder matches a local band/interleave fold") {
    for (trial <- 0 until 3) {
      val rnd = new Random(11700 + trial)
      val nStages = 1 + rnd.nextInt(4)
      val rows = (0 until 2 + rnd.nextInt(3)).flatMap { s =>
        (0 until 1 + rnd.nextInt(12)).map { i =>
          (s"d$s-$i", s"src$s", rnd.nextInt(5).toLong) // tie-heavy difficulty
        }
      }
      val df = rnd.shuffle(rows).toDF("id", "src", "diff")
        .repartition(1 + rnd.nextInt(4))
      val got = CorpusAssembly.curriculumOrder(df, "id", "src", "diff", nStages)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      val ranked = rows.groupBy(_._2).values.flatMap { rs =>
        val nSrc = rs.size.toLong
        rs.sortBy(r => (r._3, r._1)).zipWithIndex.map { case ((id, s, _), i) =>
          val rn = (i + 1).toLong
          (id, s, rn, (rn - 1) * nStages / nSrc + 1)
        }
      }.toVector
      val byStage = ranked.groupBy(_._4).view.mapValues(
        _.sortBy { case (id, s, rn, _) => (rn, s, id) }).toMap
      val offMap = {
        var acc = 0L
        byStage.keys.toVector.sorted.map { st =>
          val o = st -> acc; acc += byStage(st).size; o
        }.toMap
      }
      val want = byStage.flatMap { case (st, rs) =>
        rs.zipWithIndex.map { case ((id, s, _, _), i) =>
          (id, s, st, (i + 1).toLong, offMap(st) + i + 1)
        }
      }.toSet
      assert(got == want, s"trial $trial (stages=$nStages)")
    }
  }

  test("fuzz: neymanAllocation and paddingWaste match local folds") {
    for (trial <- 0 until 3) {
      val rnd = new Random(11800 + trial)
      val k = 10L + rnd.nextInt(200)
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { s =>
        val flat = s == 0 // zero-variance stratum -> weight 0
        (0 until 1 + rnd.nextInt(15)).map { _ =>
          val v: java.lang.Double =
            if (rnd.nextInt(10) == 0) null
            else if (flat) 2.5 else (rnd.nextInt(2001) - 1000) / 16.0
          (s"st$s", v)
        }
      }
      val df = rnd.shuffle(rows).toDF("stratum", "v")
        .repartition(1 + rnd.nextInt(4))
      val gotN = CorpusAssembly.neymanAllocation(df, "stratum", "v", k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val strata = rows.filter(_._2 != null).groupBy(_._1).map { case (st, rs) =>
        val cents = rs.map(r => BigInt(math.floor(r._2.doubleValue * 100).toLong))
        val n = BigInt(cents.size)
        val s = cents.sum
        val ss = cents.map(c => c * c).sum
        val v = (n * ss - s * s) / (n * n)
        val sigma = if (n > 1 && v > 0)
          math.floor(math.sqrt(v.toDouble) * 1000000.0).toLong else 0L
        (st, cents.size.toLong, sigma, n * sigma)
      }
      val tw = strata.map(_._4).sum
      val wantN = strata.map { case (st, n, sigma, w) =>
        (st, n, sigma, if (tw > 0) ((k * w) / tw).toLong else 0L)
      }.toSet
      assert(gotN == wantN, s"trial $trial neyman (k=$k)")

      val texts = (0 until 5 + rnd.nextInt(25)).map(_ => Tuple1(text(rnd, 20)))
      val tDf = texts.toDF("text").repartition(1 + rnd.nextInt(4))
      val gotP = CorpusAssembly.paddingWaste(tDf, "text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .toSet
      def bucketOf(n: Long): Long =
        if (n == 0L) 0L
        else if (n == 1L) 1L
        else 1L << (64 - java.lang.Long.numberOfLeadingZeros(n - 1))
      val wantP = texts
        .map(t => t._1.split(" ", -1).count(_.nonEmpty).toLong)
        .groupBy(bucketOf).map { case (b, ns) =>
          val nd = ns.size.toLong
          val st = ns.sum
          val padded = nd * b
          (b, nd, st, padded, padded - st,
            if (b > 0) (padded - st) * 1000000L / padded else 0L)
        }.toSet
      assert(gotP == wantP, s"trial $trial padding")
    }
  }

  test("fuzz: dsirScores matches a local hashed-unigram fold") {
    for (trial <- 0 until 3) {
      val rnd = new Random(11900 + trial)
      val nBuckets = 8 << rnd.nextInt(3) // small: forced bucket collisions
      val rows = (0 until 8 + rnd.nextInt(15)).map { i =>
        (s"d$i", text(rnd, 12), rnd.nextInt(3) == 0)
      }
      val df = rnd.shuffle(rows).toDF("id", "text", "tgt")
        .repartition(1 + rnd.nextInt(4))
      val out = CorpusAssembly.dsirScores(df, "id", "text", col("tgt"),
          nBuckets)
        .collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
        .toSet
      val toks = rows.map { case (id, t, tgt) =>
        (id, tgt, t.split(" ", -1).filter(_.nonEmpty)
          .map(w => h16(w) % nBuckets).toVector)
      }
      val ct = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      val cr = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      toks.foreach { case (_, tgt, bs) =>
        bs.foreach(b => if (tgt) ct(b) += 1 else cr(b) += 1)
      }
      val (tt, tr) = (ct.values.sum, cr.values.sum)
      val b = nBuckets.toLong
      def w(bk: Long): Long = roundLong(math.log(
        ((ct(bk) + 1L) * (tr + b)).toDouble /
          ((cr(bk) + 1L) * (tt + b)).toDouble) * 1e6)
      val want = toks.map { case (id, tgt, bs) =>
        val score = bs.map(w).sum
        (id, tgt, bs.size.toLong, score, !tgt && score > 0L)
      }.toSet
      assert(out == want, s"trial $trial (B=$nBuckets): " +
        s"diff=${(out diff want).take(3)} / ${(want diff out).take(3)}")
    }
  }

  test("fuzz: sampleStratified and shuffleShards match local md5 folds") {
    for (trial <- 0 until 3) {
      val rnd = new Random(12000 + trial)
      val seed = s"ss$trial"
      val rows = (0 until 3 + rnd.nextInt(3)).flatMap { s =>
        (0 until 1 + rnd.nextInt(25)).map(i => (s"st$s", s"d$s-$i"))
      }
      val fractions = Map("st0" -> 0.5, "st1" -> (rnd.nextInt(10000) / 10000.0))
      val default = rnd.nextInt(10000) / 10000.0
      val df = rnd.shuffle(rows).toDF("stratum", "id")
        .repartition(1 + rnd.nextInt(4))
      val gotS = CorpusAssembly.sampleStratified(df, "stratum", "id",
          fractions, default, seed)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val wantS = rows.filter { case (st, id) =>
        val cut = math.round(fractions.getOrElse(st, default) * 10000)
        h16(s"$seed:$id") % 10000 < cut
      }.toSet
      assert(gotS == wantS, s"trial $trial sample")

      val nShards = 2 + rnd.nextInt(4)
      val gotH = CorpusAssembly.shuffleShards(df, "id", nShards, seed)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
        .toSet
      val wantH = rows.groupBy(r => h16(s"$seed:${r._2}") % nShards)
        .flatMap { case (shard, rs) =>
          rs.sortBy { case (_, id) => (md5hex(s"$seed:$id"), id) }
            .zipWithIndex.map { case ((st, id), i) =>
              (st, id, shard, (i + 1).toLong) }
        }.toSet
      assert(gotH == wantH, s"trial $trial shards (n=$nShards)")
    }
  }
}
