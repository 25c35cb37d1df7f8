package graft.mm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("data-URL decode/encode roundtrip") {
    val payload = Array[Byte](1, 2, 3, 4, 5)
    val url = "data:image/png;base64," +
      java.util.Base64.getEncoder.encodeToString(payload)
    val df = Seq(url).toDF("u")
    val dec = Multimodal.fromDataUrl(df, "u")
    val row = dec.collect()(0)
    assert(row.getAs[String]("mime") == "image/png")
    assert(row.getAs[Array[Byte]]("payload").toSeq == payload.toSeq)

    val enc = Multimodal.toDataUrl(dec, "mime", "payload")
    assert(enc.select("data_url").as[String].collect()(0) == url)
  }

  test("extractFeatures: per-partition decoder, stable features, null-safe") {
    val df = Seq(
      (1L, Array[Byte](10, 20, 30)),
      (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload").repartition(2)
    val r = Multimodal.extractFeatures(df, "payload", () => new Multimodal.FakeDecoder(4))
      .orderBy("id").collect()
    assert(!r(0).isNullAt(r(0).fieldIndex("features")))
    assert(r(0).getAs[scala.collection.Seq[Float]]("features").length == 4)
    assert(r(0).getAs[Int]("width") >= 1)
    assert(r(1).isNullAt(r(1).fieldIndex("features")))

    // determinism: same payload → same features
    val again = Multimodal.extractFeatures(df, "payload", () => new Multimodal.FakeDecoder(4))
      .orderBy("id").collect()
    assert(again(0).getAs[scala.collection.Seq[Float]]("features").toSeq ==
      r(0).getAs[scala.collection.Seq[Float]]("features").toSeq)
  }
}
