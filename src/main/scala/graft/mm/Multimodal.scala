package graft.mm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per partition.
  *
  * The reference smuggles images through base64 data-URL strings
  * (handlers/base.py:241-272, utils/gpt.py:54-70); the engine keeps
  * payloads binary (no base64 inflation through shuffles) and converts at
  * the edges with the base64/unbase64 built-ins.
  *
  * The actual media decode is environment-dependent (no imaging libs in
  * this container), so [[MediaDecoder]] is a pluggable trait with a
  * deterministic fake; the Spark-side contract — schema, batch iteration,
  * partition-local decoder instantiation — is real and tested.
  */
object Multimodal {

  /** data:image/...;base64,xxx string → (mime, payload binary). */
  def fromDataUrl(df: DataFrame, dataUrlCol: String): DataFrame =
    df.withColumn("mime",
        regexp_extract(col(dataUrlCol), "^data:([^;]+);base64,", 1))
      .withColumn("payload",
        unbase64(regexp_replace(col(dataUrlCol), "^data:[^;]+;base64,", "")))

  /** (mime, payload) → data URL string, reference encoding
    * (utils/gpt.py:54-70).
    */
  def toDataUrl(df: DataFrame, mimeCol: String, payloadCol: String,
      outputCol: String = "data_url"): DataFrame =
    df.withColumn(outputCol,
      concat(lit("data:"), col(mimeCol), lit(";base64,"),
        // base64() may wrap output with \r\n line breaks per RFC 2045 in
        // some configurations; chunked encoding is normalized away.
        regexp_replace(base64(col(payloadCol)), "[\\r\\n]", "")))

  /** Decoder contract: bytes → fixed-size feature vector + dimensions.
    * Instantiated once per partition (model/codec init amortized).
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaFeatures
  }
  final case class MediaFeatures(width: Int, height: Int, features: Array[Float])

  /** Deterministic fake decoder: derives pseudo-dimensions and a feature
    * vector from the payload bytes. Stands in for a real image/audio codec,
    * which is not available in this environment.
    */
  class FakeDecoder(featureDim: Int = 8) extends MediaDecoder {
    override def decode(payload: Array[Byte]): MediaFeatures = {
      val h = graft.expr.SimHash64.fnv1a64(payload)
      val w = (math.abs(h) % 1920 + 1).toInt
      val ht = (math.abs(h >> 16) % 1080 + 1).toInt
      val feats = Array.tabulate(featureDim) { i =>
        (((h >>> (i * 8)) & 0xff).toFloat / 255.0f)
      }
      MediaFeatures(w, ht, feats)
    }
  }

  /** Per-partition feature extraction over a binary payload column. The
    * decoder is created once per partition — the pattern a real model
    * inference step needs (load weights once, stream the partition).
    */
  def extractFeatures(
      df: DataFrame,
      payloadCol: String,
      decoder: () => MediaDecoder,
      featureDim: Int = 8): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))

    df.mapPartitions { rows =>
      val d = decoder()
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Row.fromSeq(row.toSeq ++ Seq(null, null, null))
        else {
          val f = d.decode(payload)
          Row.fromSeq(row.toSeq ++ Seq(f.width, f.height, f.features.toSeq))
        }
      }
    }
  }

  /** Resizer contract: payload → payload at target dimensions. A real
    * implementation wraps an imaging codec; the fake is deterministic so
    * the distributed plumbing (schema, null passthrough, partition-local
    * instantiation) is testable offline.
    */
  trait MediaResizer extends Serializable {
    def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte]
  }

  /** Deterministic fake: stamps an 8-byte WxH header and truncates/pads
    * the payload proportionally to the pixel-count ratio.
    */
  class FakeResizer extends MediaResizer {
    override def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val header = java.nio.ByteBuffer.allocate(8).putInt(width).putInt(height).array()
      val n = math.max(1, math.min(payload.length, (width.toLong * height / 1024).toInt))
      header ++ payload.take(n)
    }
  }

  /** Per-partition resize of a binary payload column → `resized` column.
    * Null payloads pass through as null; the resizer is instantiated once
    * per partition (codec init amortized across the batch — the same
    * batch shape a vectorized/Arrow UDF would get).
    */
  def resizeMedia(
      df: DataFrame,
      payloadCol: String,
      width: Int,
      height: Int,
      resizer: () => MediaResizer): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("resized", BinaryType, nullable = true))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))

    df.mapPartitions { rows =>
      val r = resizer()
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](payloadIdx)
        val out = if (payload == null) null else r.resize(payload, width, height)
        Row.fromSeq(row.toSeq :+ out)
      }
    }
  }

  /** Frame-sampler contract: video payload → sampled (frame index, frame
    * payload) pairs.
    */
  trait FrameSampler extends Serializable {
    def sample(payload: Array[Byte]): Iterator[(Long, Array[Byte])]
  }

  /** Deterministic fake: treats each `frameSize`-byte chunk as a frame and
    * keeps every `everyNth` one.
    */
  class FakeFrameSampler(frameSize: Int = 16, everyNth: Int = 2) extends FrameSampler {
    override def sample(payload: Array[Byte]): Iterator[(Long, Array[Byte])] =
      payload.grouped(frameSize).zipWithIndex.collect {
        case (chunk, i) if i % everyNth == 0 => (i.toLong, chunk)
      }
  }

  /** Per-partition frame sampling: one video row fans out to one row per
    * sampled frame (`frame_idx`, `frame`) — the generator-shaped member of
    * the multimodal family (rows with null payloads produce no frames).
    * Downstream each frame is an ordinary binary payload for
    * [[extractFeatures]] / [[resizeMedia]].
    */
  def sampleFrames(
      df: DataFrame,
      payloadCol: String,
      sampler: () => FrameSampler): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))

    df.mapPartitions { rows =>
      val s = sampler()
      rows.flatMap { row =>
        val payload = row.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Iterator.empty
        else s.sample(payload).map { case (i, frame) =>
          Row.fromSeq(row.toSeq ++ Seq(i, frame))
        }
      }
    }
  }

  // ----------------------------------------------------------------- audio

  /** Audio decoder contract: bytes → (duration, sample rate, per-window
    * loudness envelope). A real implementation wraps an audio codec
    * (javax.sound / ffmpeg bindings); absent in this container, so the
    * fake derives deterministic values from the payload — the Spark-side
    * plumbing (schema, null passthrough, partition-local codec init,
    * envelope as array column) is the real, tested part.
    */
  trait AudioDecoder extends Serializable {
    def decode(payload: Array[Byte]): AudioFeatures
  }
  final case class AudioFeatures(
      durationMs: Long, sampleRate: Int, envelope: Array[Float])

  /** Deterministic fake: duration from byte length at a nominal bitrate,
    * envelope = mean absolute byte value per fixed-size window.
    */
  class FakeAudioDecoder(
      bytesPerMs: Int = 4, windows: Int = 8) extends AudioDecoder {
    override def decode(payload: Array[Byte]): AudioFeatures = {
      val dur = payload.length.toLong / math.max(1, bytesPerMs)
      val win = math.max(1, payload.length / windows)
      val env = payload.grouped(win).take(windows).map { chunk =>
        chunk.map(b => math.abs(b.toInt)).sum.toFloat / chunk.length / 128f
      }.toArray
      AudioFeatures(dur, 16000, env)
    }
  }

  /** Per-partition audio feature extraction — same decode shape as
    * [[extractFeatures]] with audio-typed outputs (duration_ms,
    * sample_rate, envelope).
    */
  def extractAudioFeatures(
      df: DataFrame,
      payloadCol: String,
      decoder: () => AudioDecoder): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("duration_ms", LongType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("envelope", ArrayType(FloatType), nullable = true)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))

    df.mapPartitions { rows =>
      val d = decoder()
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Row.fromSeq(row.toSeq ++ Seq(null, null, null))
        else {
          val f = d.decode(payload)
          Row.fromSeq(row.toSeq ++ Seq(f.durationMs, f.sampleRate, f.envelope.toSeq))
        }
      }
    }
  }

  /** Byte-level perceptual near-duplicates over binary payloads: hex the
    * bytes, shingle 8-byte windows, SimHash, and reuse the dedup family's
    * pigeonhole candidate join ([[graft.dedup.Dedup.simhashPairsOf]]) —
    * the image/media analog of text SimHash dedup, operating on the raw
    * payload so it needs no codecs (re-encoded or metadata-tweaked copies
    * still match as long as the byte stream is mostly shared; a true
    * pixel-level pHash would plug the same fingerprint frame in via the
    * decoder plumbing). Stays entirely in codegen: hex/regexp/split are
    * built-ins, shingles + simhash are native expressions.
    */
  def payloadNearDups(
      df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3, chunks: Int = 6): DataFrame = {
    // Tokens are 4-byte hex groups and shingles span 2 tokens: 8-byte
    // windows at stride 4 — 4× fewer tokens than per-byte windows for
    // the same window width. A k-byte edit still flips at most
    // ceil(k/4)+1 of ~len/4 windows, so small edits stay within the
    // Hamming budget.
    val spacedHex = trim(regexp_replace(hex(graft.Cols.q(payloadCol)), "(........)", "$1 "))
    val fp = df
      .filter(graft.Cols.q(payloadCol).isNotNull)
      .select(graft.Cols.q(idCol).as("doc"),
        graft.GraftFunctions.simhash64(
          graft.GraftFunctions.wordShingles(spacedHex, 2)).as("fp"))
    graft.dedup.Dedup.simhashPairsOf(fp, maxHamming, chunks)
  }
}
