package graft.text

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the n-gram language-model scoring family
  * against independent local folds: add-one bigram scoring, Stupid
  * Backoff's three tiers + OOV accounting on a held-out corpus (the
  * split that actually exercises backoff), PMI collocations, and
  * per-group n-gram document frequency. A tiny word vocabulary forces
  * dense n-gram collisions; the folds recompute the per-gram micro-nat
  * quantization (round(ln·10⁶) HALF_UP) and the floored mean quotient
  * exactly. Seeds are pinned so every trial reproduces.
  */
class LmFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def roundLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private val vocab = IndexedSeq("aa", "bb", "cc", "dd")
  private val oovVocab = IndexedSeq("xx", "yy") // score-only words

  private def text(rnd: Random, maxWords: Int, extra: Boolean): String = {
    val pool = if (extra) vocab ++ oovVocab else vocab
    (0 until rnd.nextInt(maxWords + 1))
      .map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")
  }

  private def toks(s: String): Vector[String] =
    Option(s).getOrElse("").trim.split("\\s+").filter(_.nonEmpty).toVector

  test("fuzz: lmBigramScore matches a local add-one fold") {
    for (trial <- 0 until 3) {
      val rnd = new Random(10700 + trial)
      val rows = (0 until 6 + rnd.nextInt(15)).map { i =>
        (s"d$i", if (rnd.nextInt(10) == 0) null else text(rnd, 12, extra = false))
      }
      val df = rnd.shuffle(rows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = TextAnalysis.lmBigramScore(df, "id", "text")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toSet
      val docToks = rows.map { case (id, t) => (id, toks(t)) }
      val allToks = docToks.flatMap(_._2)
      val uc = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bc = docToks.flatMap(_._2.sliding(2).filter(_.size == 2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val v = uc.size.toDouble
      val want = docToks.map { case (id, ts) =>
        if (ts.size < 2) (id, 0L, None)
        else {
          val lps = ts.sliding(2).toVector.map { bg =>
            roundLong(math.log((bc(bg) + 1.0) / (uc(bg.head) + v)) * 1e6)
          }
          (id, lps.size.toLong,
            Some(math.floor(lps.sum.toDouble / lps.size.toDouble).toLong / 1e6))
        }
      }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: stupidBackoffScore matches a local three-tier fold on a " +
    "held-out corpus") {
    for (trial <- 0 until 3) {
      val rnd = new Random(10800 + trial)
      val train = (0 until 6 + rnd.nextInt(12)).map { i =>
        (s"t$i", text(rnd, 12, extra = false))
      }
      val score = (0 until 4 + rnd.nextInt(10)).map { i =>
        (s"s$i", if (rnd.nextInt(10) == 0) null else text(rnd, 10, extra = true))
      }
      val trainDf = rnd.shuffle(train).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val scoreDf = rnd.shuffle(score).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = TextAnalysis.stupidBackoffScore(trainDf, scoreDf, "id", "text")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
        .toSet
      val trainToks = train.map(r => toks(r._2))
      val uni = trainToks.flatten.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val bi = trainToks.flatMap(_.sliding(2).filter(_.size == 2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tri = trainToks.flatMap(_.sliding(3).filter(_.size == 3))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = trainToks.map(_.size).sum.toDouble
      val want = score.map { case (id, t) =>
        val ts = toks(t)
        val tgs = ts.sliding(3).filter(_.size == 3).toVector
        var (nT, nB, nU, nO) = (0L, 0L, 0L, 0L)
        var sum = 0L
        tgs.foreach { tg =>
          if (tri.contains(tg)) {
            nT += 1
            sum += roundLong(
              math.log(tri(tg).toDouble / bi(tg.take(2))) * 1e6)
          } else if (bi.contains(tg.drop(1))) {
            nB += 1
            sum += roundLong(
              math.log(0.4 * bi(tg.drop(1)) / uni(tg(1))) * 1e6)
          } else if (uni.contains(tg(2))) {
            nU += 1
            sum += roundLong(math.log(0.16 * uni(tg(2)) / n) * 1e6)
          } else nO += 1
        }
        val scored = nT + nB + nU
        (id, nT, nB, nU, nO,
          if (scored > 0)
            Some(math.floor(sum.toDouble / scored.toDouble).toLong / 1e6)
          else None)
      }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: pmiCollocations matches a local PMI fold") {
    for (trial <- 0 until 3) {
      val rnd = new Random(10900 + trial)
      val minCount = 1 + rnd.nextInt(3)
      val topK = 3 + rnd.nextInt(10)
      val rows = (0 until 6 + rnd.nextInt(15)).map { i =>
        (s"d$i", text(rnd, 12, extra = false))
      }
      val df = rnd.shuffle(rows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = TextAnalysis.pmiCollocations(df, "id", "text", minCount, topK)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val docToks = rows.map(r => toks(r._2))
      val allToks = docToks.flatten
      val uc = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nTok = allToks.size.toLong
      val want = docToks.flatMap(_.sliding(2).filter(_.size == 2))
        .groupBy(identity).view.mapValues(_.size.toLong).toVector
        .filter(_._2 >= minCount)
        .map { case (bg, np) =>
          (bg.head, bg(1), np, roundLong(math.log(
            np.toDouble * nTok / (uc(bg.head).toDouble * uc(bg(1)))) * 1e6))
        }
        .sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }
        .take(topK)
      // ordered compare: the operator RETURNS a ranking
      assert(got.toVector == want, s"trial $trial (min=$minCount k=$topK)")
    }
  }

  test("fuzz: ngramDocFreq matches a local per-group doc-frequency fold") {
    for (trial <- 0 until 3) {
      val rnd = new Random(11000 + trial)
      val n = 2 + rnd.nextInt(2)
      val k = 2 + rnd.nextInt(5)
      val rows = (0 until 8 + rnd.nextInt(20)).map { i =>
        (s"g${rnd.nextInt(3)}", text(rnd, 10, extra = false))
      }
      val df = rnd.shuffle(rows).toDF("grp", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = TextAnalysis.ngramDocFreq(df, "grp", "text", n, k)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = rows
        .map { case (g, t) => (g, toks(t)) }
        .filter(_._2.size >= n)
        .flatMap { case (g, ts) =>
          ts.sliding(n).map(_.mkString(" ")).toSet.map((gram: String) => (g, gram))
        }
        .groupBy(identity).view.mapValues(_.size.toLong).toVector
        .groupBy(_._1._1).values.flatMap { gs =>
          gs.sortBy { case ((_, gram), c) => (-c, gram) }
            .zipWithIndex.take(k)
            .map { case (((g, gram), c), i) => (g, gram, (i + 1).toLong, c) }
        }.toSet
      assert(got == want, s"trial $trial (n=$n k=$k)")
    }
  }
}
