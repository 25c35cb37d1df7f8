package graft.text

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials for the sequence-construction operators
  * against independent local folds: sliding-window chunking (stride
  * arithmetic, the one-empty-chunk contract), packed-sequence
  * materialization (order-structural concat), FIM splits (seeded span
  * selection and exact substring reassembly), and word2vec skip-gram
  * pairs with the frequent-word subsample (survivor re-sequencing is
  * the behavior under test: dropping a token must bring its neighbours
  * into range). Seeds are pinned so every trial reproduces.
  */
class SeqFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val words = IndexedSeq("aa", "bb", "cc", "dd", "ee")
  private def text(rnd: Random, maxWords: Int): String =
    (0 until rnd.nextInt(maxWords + 1))
      .map(_ => words(rnd.nextInt(words.size))).mkString(" ")

  test("fuzz: chunkDocuments matches a local stride fold") {
    for (trial <- 0 until 3) {
      val rnd = new Random(11100 + trial)
      val chunkTokens = 2 + rnd.nextInt(5)
      val overlap = rnd.nextInt(chunkTokens)
      val stride = chunkTokens - overlap
      val rows = (0 until 6 + rnd.nextInt(15)).map { i =>
        (s"d$i", text(rnd, 18)) // includes empty docs
      }
      val df = rnd.shuffle(rows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = CorpusAssembly.chunkDocuments(df, "id", "text",
          chunkTokens, overlap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getLong(3)))
        .toSet
      val want = rows.flatMap { case (id, t) =>
        val toks = t.split(" ", -1).toVector // Spark split: "" -> [""]
        val nTok = toks.size
        val nChunks = 1 + math.floor(
          (math.max(nTok - chunkTokens, 0) + stride - 1).toDouble /
            stride).toInt
        (0 until nChunks).map { c =>
          val chunk = toks.slice(c * stride, c * stride + chunkTokens)
            .mkString(" ")
          val n = if (chunk.isEmpty) 0L
            else chunk.split(" ", -1).length.toLong
          (id, c.toLong, chunk, n)
        }
      }.toSet
      assert(got == want, s"trial $trial (chunk=$chunkTokens ov=$overlap): " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: materializeSequences concatenates in stream order") {
    for (trial <- 0 until 3) {
      val rnd = new Random(11200 + trial)
      val packed = (0 until 2 + rnd.nextInt(3)).flatMap { sh =>
        (0 until 1 + rnd.nextInt(4)).flatMap { sq =>
          (0 until 1 + rnd.nextInt(6)).map { p =>
            (sh.toLong, sq.toLong, p.toLong, 1L + rnd.nextInt(20),
              s"t$sh-$sq-$p ${text(rnd, 4)}".trim)
          }
        }
      }
      val df = rnd.shuffle(packed)
        .toDF("shard", "seq_id", "seq_pos", "n_tokens", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = CorpusAssembly.materializeSequences(df, "text", " | ")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
        .toSet
      val want = packed.groupBy(p => (p._1, p._2)).map { case ((sh, sq), ps) =>
        val ordered = ps.sortBy(_._3)
        (sh, sq, ps.size.toLong, ps.map(_._4).sum,
          ordered.map(_._5).mkString(" | "))
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("fuzz: fimSplit matches a local seeded span fold") {
    for (trial <- 0 until 3) {
      val rnd = new Random(11300 + trial)
      val seed = s"f$trial"
      val minChars = 4 + rnd.nextInt(8)
      val rows = (0 until 8 + rnd.nextInt(15)).map { i =>
        val t: String =
          if (rnd.nextInt(10) == 0) null
          else (0 until rnd.nextInt(3 * minChars))
            .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
        (s"d$i", t)
      }
      val df = rnd.shuffle(rows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = CorpusAssembly.fimSplit(df, "id", "text", seed, minChars)
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getString(4)))
        .toSet
      val want = rows.filter(_._2 != null).map { case (id, t) =>
        val len = t.length.toLong
        if (len < minChars)
          (id, len, None, None, s"<PRE>$t<SUF><MID>")
        else {
          def cut(salt: String): Long = 1L + java.lang.Long.parseLong(
            md5hex(s"$seed$salt:$id").take(4), 16) % (len - 1)
          val (c1, c2) = (cut("a"), cut("b"))
          val (lo, hi) = (math.min(c1, c2).toInt, math.max(c1, c2).toInt)
          val fim = "<PRE>" + t.substring(0, lo) + "<SUF>" +
            t.substring(hi) + "<MID>" + t.substring(lo, hi)
          (id, len, Some(lo.toLong), Some(hi.toLong), fim)
        }
      }.toSet
      assert(got == want, s"trial $trial (min=$minChars): " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }

  test("fuzz: skipGramPairs matches a local subsample-then-window fold") {
    for (trial <- 0 until 3) {
      val rnd = new Random(11400 + trial)
      val window = 1 + rnd.nextInt(3)
      val seed = s"sg$trial"
      // tDen small enough that keep probabilities straddle 1 both ways
      val (tNum, tDen) = (1L, 2L + rnd.nextInt(6))
      val rows = (0 until 6 + rnd.nextInt(12)).map { i =>
        (s"d$i", text(rnd, 14))
      }
      val df = rnd.shuffle(rows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = CorpusAssembly.skipGramPairs(df, "id", "text", window,
          tNum, tDen, seed)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      val occ = rows.flatMap { case (id, t) =>
        t.split(" ", -1).filter(_.nonEmpty).zipWithIndex
          .map { case (w, p) => (id, p.toLong, w) }
      }
      val uc = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val n = occ.size.toLong
      val kept = occ.filter { case (id, p, w) =>
        val tail = java.lang.Long.parseLong(
          md5hex(s"$seed:$id:$p").take(10), 16) + 1L
        val u = tail.toDouble / 1099511627776.0
        u < math.sqrt((n * tNum).toDouble / (uc(w) * tDen).toDouble)
      }
      val pairs = kept.groupBy(_._1).values.flatMap { ps =>
        val t = ps.sortBy(_._2).map(_._3).toVector // re-sequenced survivors
        for {
          d <- 1 to window
          i <- 0 until t.size - d
          pr <- Seq((t(i), t(i + d)), (t(i + d), t(i)))
        } yield pr
      }
      val want = pairs.groupBy(identity).map { case ((c, x), ps) =>
        (c, x, ps.size.toLong) }.toSet
      assert(got == want, s"trial $trial (w=$window tDen=$tDen): " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }
}
