package graft.text

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differentials for the corpus-assembly samplers and mixture
  * math against independent local folds. Everything here is seeded-hash
  * deterministic by design (md5 buckets, exponential keys, fixed-order
  * running sums), so the fold recomputes the exact md5/quantization
  * arithmetic and compares EXACT row sets — a mismatch is a broken
  * sampler contract, not noise. Seeds are pinned so every trial
  * reproduces.
  */
class CorpusFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def roundLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def tokCount(s: String): Long = {
    val t = Option(s).getOrElse("").trim
    if (t.isEmpty) 0L else t.split("\\s+").length.toLong
  }

  private val words = IndexedSeq("ab", "cd", "ef", "gh", "ij", "kl")
  private def text(rnd: Random, maxWords: Int): String =
    (0 until rnd.nextInt(maxWords + 1))
      .map(_ => words(rnd.nextInt(words.size))).mkString(" ")

  test("fuzz: capStrata keeps exactly the md5-bucket prefix per stratum") {
    for (trial <- 0 until 3) {
      val rnd = new Random(10200 + trial)
      val cap = 1L + rnd.nextInt(12)
      val seed = s"s$trial"
      val rows = (0 until 3 + rnd.nextInt(3)).flatMap { s =>
        (0 until 1 + rnd.nextInt(40)).map(i => (s"st$s", s"d$s-$i"))
      }
      val df = rnd.shuffle(rows).toDF("stratum", "id")
        .repartition(1 + rnd.nextInt(4))
      val got = CorpusAssembly.capStrata(df, "stratum", "id", cap, seed)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val byStratum = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val want = rows.filter { case (st, id) =>
        val cutoff = math.min(10000L,
          math.floor(cap * 10000.0 / byStratum(st)).toLong)
        java.lang.Long.parseLong(md5hex(s"$seed:$id").take(4), 16) % 10000 < cutoff
      }.toSet
      assert(got == want, s"trial $trial (cap=$cap)")
      // the cap CONTRACT is statistical, but never exceeds ~cap + tail:
      got.groupBy(_._1).foreach { case (st, kept) =>
        assert(kept.size <= byStratum(st), s"stratum $st grew")
      }
    }
  }

  test("fuzz: weightedSample keeps exactly the k smallest exponential keys") {
    for (trial <- 0 until 3) {
      val rnd = new Random(10300 + trial)
      val k = 1 + rnd.nextInt(6)
      val seed = s"w$trial"
      val rows = (0 until 2 + rnd.nextInt(4)).flatMap { g =>
        (0 until 1 + rnd.nextInt(25)).map { i =>
          val w: java.lang.Long =
            if (rnd.nextInt(8) == 0) null
            else (rnd.nextInt(22) - 2).toLong // includes 0 and negatives
          (s"g$g", s"d$g-$i", w)
        }
      }
      val df = rnd.shuffle(rows).toDF("g", "id", "w")
        .repartition(1 + rnd.nextInt(4))
      val got = CorpusAssembly.weightedSample(df, Seq("g"), "id", "w", k, seed)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = rows.filter(r => r._3 != null && r._3.longValue > 0L)
        .map { case (g, id, w) =>
          val tail = java.lang.Long.parseLong(
            md5hex(s"$seed:$id").take(10), 16) + 1L
          val u = tail.toDouble / 1099511627776.0
          val ln = roundLong(-math.log(u) * 1e6)
          (g, id, w.longValue, ln * 1000000L / w.longValue)
        }
        .groupBy(_._1).values.flatMap { gs =>
          gs.sortBy { case (_, id, _, key) => (key, id) }.take(k)
        }
        .map { case (g, id, w, _) => (g, id, w) }.toSet
      assert(got == want, s"trial $trial (k=$k)")
    }
  }

  test("fuzz: mixtureReport and temperatureMixture match local " +
    "running-sum folds") {
    for (trial <- 0 until 3) {
      val rnd = new Random(10400 + trial)
      val sources = (0 until 3 + rnd.nextInt(4)).map(s => s"src$s")
      val rows = sources.flatMap { s =>
        (0 until 1 + rnd.nextInt(10)).map(i => (s, s"$s-$i", text(rnd, 12)))
      }
      val targets = sources.filter(_ => rnd.nextInt(2) == 0) match {
        case Seq() => Map(sources.head -> 0.3)
        case ts => ts.zipWithIndex
          .map { case (s, i) => s -> (0.5 / (i + 1) / ts.size) }.toMap
      }
      val df = rnd.shuffle(rows).toDF("source", "id", "text")
        .repartition(1 + rnd.nextInt(4))
      val perSrc = rows.groupBy(_._1).view.mapValues { rs =>
        (rs.size.toLong, rs.map(r => tokCount(r._3)).sum)
      }.toMap
      val total = perSrc.values.map(_._2).sum

      val gotR = CorpusAssembly.mixtureReport(df, "source", "text", targets)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
        .toSet
      val wantR = perSrc.map { case (s, (nDocs, nTok)) =>
        val share = if (total > 0) Some(round6(nTok.toDouble / total)) else None
        val tgt = targets.get(s)
        val mult = tgt.filter(_ => nTok > 0)
          .map(t => round6(t * total / nTok))
        (s, nDocs, nTok, share, tgt, mult)
      }.toSet
      assert(gotR == wantR, s"trial $trial report: " +
        s"diff=${(gotR diff wantR).take(3)} / ${(wantR diff gotR).take(3)}")

      val gotT = CorpusAssembly.temperatureMixture(df, "source", "text")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      val ordered = perSrc.toVector.sortBy(_._1) // the pinned source order
      val z = ordered.foldLeft(0.0) { case (acc, (_, (_, n))) =>
        acc + math.sqrt(n.toDouble) } // sequential adds, same order
      val wantT = ordered.map { case (s, (_, n)) =>
        val w = math.sqrt(n.toDouble)
        val share = math.floor(w / z * 1000000.0).toLong
        val mult = if (n > 0)
          Some(math.floor(w / z * total.toDouble / n.toDouble * 1000000.0)
            .toLong)
        else None
        (s, n, share, mult)
      }.toSet
      assert(gotT == wantT, s"trial $trial temperature: " +
        s"diff=${(gotT diff wantT).take(3)} / ${(wantT diff gotT).take(3)}")
    }
  }

  test("fuzz: applyMixture materializes exactly floor+hash-fraction copies") {
    for (trial <- 0 until 3) {
      val rnd = new Random(10500 + trial)
      val seed = s"m$trial"
      val sources = (0 until 3 + rnd.nextInt(3)).map(s => s"src$s")
      val rows = sources.flatMap { s =>
        val emptySource = s == sources.head // targeted but zero tokens
        (0 until 1 + rnd.nextInt(8)).map(i =>
          (s, s"$s-$i", if (emptySource) "" else text(rnd, 10)))
      }
      val targets = Map(sources.head -> 0.4,
        sources(1 + rnd.nextInt(sources.size - 1)) -> 0.3)
      val df = rnd.shuffle(rows).toDF("source", "id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = CorpusAssembly.applyMixture(df, "source", "text", "id",
          targets, seed)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
        .toSet
      val perSrc = rows.groupBy(_._1).view
        .mapValues(_.map(r => tokCount(r._3)).sum).toMap
      val total = perSrc.values.sum
      val want = rows.flatMap { case (s, id, _) =>
        val n = perSrc(s)
        val mult = targets.get(s).filter(_ => n > 0)
          .map(t => t * total / n).getOrElse(1.0)
        val kWhole = math.floor(mult).toLong
        val h16 = java.lang.Long.parseLong(md5hex(s"$seed:$id").take(4), 16)
        val extra =
          if (h16.toDouble < (mult - math.floor(mult)) * 65536.0) 1L else 0L
        (0L until (kWhole + extra)).map(c => (s, id, c))
      }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: vocabCoverage and corpusAttrition match local folds") {
    for (trial <- 0 until 3) {
      val rnd = new Random(10600 + trial)
      val rows = (0 until 5 + rnd.nextInt(20)).map { i =>
        (s"d$i", text(rnd, 15), rnd.nextInt(100).toLong)
      }
      val df = rnd.shuffle(rows).toDF("id", "text", "score")
        .repartition(1 + rnd.nextInt(4))
      val k = 2 + rnd.nextInt(5)
      val gotV = CorpusAssembly.vocabCoverage(df, "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3)))
        .toSet
      val toks = rows.flatMap(r =>
        Option(r._2).getOrElse("").trim.split("\\s+").filter(_.nonEmpty))
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
        .toVector.sortBy { case (t, n) => (-n, t) }
      val totalToks = toks.size.toLong
      val cums = counts.scanLeft(0L)(_ + _._2).tail
      val wantV = counts.zip(cums).zipWithIndex.take(k).map {
        case (((t, n), cum), i) =>
          ((i + 1).toLong, t, n, round6(cum.toDouble / totalToks))
      }.toSet
      assert(gotV == wantV, s"trial $trial vocab (k=$k)")

      val stages = Seq(
        "nonempty" -> (length(trim(col("text"))) > 0),
        "score50" -> (col("score") >= 50L),
        "short" -> (length(col("text")) < 40))
      val gotA = CorpusAssembly.corpusAttrition(df, stages)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val preds = Seq[((String, String, Long)) => Boolean](
        r => r._2.trim.nonEmpty,
        r => r._3 >= 50L,
        r => r._2.length < 40)
      val survivorSets = preds.scanLeft(rows.toVector) { (alive, p) =>
        alive.filter(p)
      }.tail
      val wantA = survivorSets.zipWithIndex.map { case (alive, i) =>
        val prev = if (i == 0) rows.size else survivorSets(i - 1).size
        ((i + 1).toLong, stages(i)._1, alive.size.toLong,
          (prev - alive.size).toLong)
      }.toSet
      assert(gotA == wantA, s"trial $trial attrition")
    }
  }
}
