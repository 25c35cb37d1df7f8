package graft.mm

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differentials for the multimodal plumbing against
  * independent local references: the data-URL codec against
  * java.util.Base64 (roundtrip identity on arbitrary bytes, empty
  * payloads included), the per-partition feature extractor against an
  * independently-written FNV-1a64 (the published constants, not the
  * repo's), and the changeset applier against a last-writer-wins fold
  * with deletes, inserts, and seq ties. Seeds are pinned so every
  * trial reproduces.
  */
class MultimodalFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("fuzz: data-URL codec matches java.util.Base64 and roundtrips") {
    for (trial <- 0 until 3) {
      val rnd = new Random(17300 + trial)
      val rows = (0 until 8 + rnd.nextInt(15)).map { i =>
        val payload = new Array[Byte](rnd.nextInt(200))
        rnd.nextBytes(payload)
        (s"m$i", Seq("image/png", "audio/wav", "video/mp4")(rnd.nextInt(3)),
          payload)
      }
      val df = rnd.shuffle(rows).toDF("id", "mime", "payload")
        .repartition(1 + rnd.nextInt(4))
      val enc = Multimodal.toDataUrl(df, "mime", "payload")
      val gotUrl = enc.select(col("id"), col("data_url"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val wantUrl = rows.map { case (id, mime, p) =>
        (id, s"data:$mime;base64," +
          java.util.Base64.getEncoder.encodeToString(p))
      }.toSet
      assert(gotUrl == wantUrl, s"trial $trial encode")

      val back = Multimodal.fromDataUrl(
          enc.select(col("id"), col("data_url")), "data_url")
        .select(col("id"), col("mime"), col("payload"))
        .collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getAs[Array[Byte]](2).toVector))
        .toSet
      val wantBack = rows.map { case (id, mime, p) =>
        (id, mime, p.toVector) }.toSet
      assert(back == wantBack, s"trial $trial roundtrip")
    }
  }

  test("fuzz: extractFeatures matches an independent FNV-1a64 reference") {
    // FNV-1a 64-bit from the published spec (offset basis / prime),
    // written independently of graft.expr.SimHash64.fnv1a64
    def fnv(bytes: Array[Byte]): Long = {
      var h = java.lang.Long.parseUnsignedLong("cbf29ce484222325", 16)
      bytes.foreach { b =>
        h = (h ^ (b & 0xff)) * java.lang.Long.parseUnsignedLong("100000001b3", 16)
      }
      h
    }
    for (trial <- 0 until 3) {
      val rnd = new Random(17400 + trial)
      val rows = (0 until 8 + rnd.nextInt(15)).map { i =>
        val p: Array[Byte] =
          if (rnd.nextInt(8) == 0) null
          else {
            val a = new Array[Byte](rnd.nextInt(64))
            rnd.nextBytes(a); a
          }
        (s"m$i", p)
      }
      val df = rnd.shuffle(rows).toDF("id", "payload")
        .repartition(1 + rnd.nextInt(4))
      val got = Multimodal.extractFeatures(df, "payload",
          () => new Multimodal.FakeDecoder(8))
        .select(col("id"), col("width"), col("height"), col("features"))
        .collect()
        .map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getInt(1)),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getSeq[Float](3).toVector)))
        .toSet
      val want = rows.map { case (id, p) =>
        if (p == null) (id, None, None, None)
        else {
          val h = fnv(p)
          val w = (math.abs(h) % 1920 + 1).toInt
          val ht = (math.abs(h >> 16) % 1080 + 1).toInt
          val feats = (0 until 8).map(i =>
            ((h >>> (i * 8)) & 0xff).toFloat / 255.0f).toVector
          (id, Some(w), Some(ht), Some(feats))
        }
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("fuzz: applyChangeset matches a last-writer-wins fold") {
    for (trial <- 0 until 4) {
      val rnd = new Random(17500 + trial)
      val baseIds = (0 until 5 + rnd.nextInt(15)).map(i => s"k$i")
      val base = baseIds.map(id => (id, s"a-$id", rnd.nextInt(100).toLong))
      val changes = (0 until rnd.nextInt(30)).map { _ =>
        val id = if (rnd.nextInt(3) == 0) s"new${rnd.nextInt(5)}"
          else baseIds(rnd.nextInt(baseIds.size))
        val op = if (rnd.nextInt(4) == 0) "delete" else "upsert"
        val seq = rnd.nextInt(5).toLong // tiny seq domain -> ties
        // payload is a function of (id, op, seq): exact (seq, op) ties
        // carry identical payloads, so the max_by tie is harmless
        (id, op, seq, s"c-$id-$op-$seq", seq)
      }
      val bDf = rnd.shuffle(base).toDF("id", "a", "b")
        .repartition(1 + rnd.nextInt(4))
      val cDf = rnd.shuffle(changes).toDF("id", "op", "seq", "a", "b")
        .repartition(1 + rnd.nextInt(4))
      val got = graft.dedup.Dedup.applyChangeset(bDf, cDf, "id")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      // winner per id: max by (seq, op) — "upsert" > "delete" on ties
      val winners = changes.groupBy(_._1).view.mapValues(cs =>
        cs.maxBy(c => (c._3, c._2))).toMap
      val kept = base.flatMap { case (id, a, b) =>
        winners.get(id) match {
          case Some((_, "delete", _, _, _)) => None
          case Some((_, _, _, ca, cb)) => Some((id, ca, cb))
          case None => Some((id, a, b))
        }
      }
      val inserted = winners.collect {
        case (id, (_, op, _, ca, cb))
          if !baseIds.contains(id) && op != "delete" => (id, ca, cb)
      }
      val want = (kept ++ inserted).toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }
}
