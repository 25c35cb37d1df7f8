package graft.dedup

import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(d: org.apache.spark.sql.DataFrame) =
    Dedup.winnowFingerprints(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("identical documents select identical fingerprint sets") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val out = fps(Seq((1L, text), (2L, text)).toDF("doc_id", "text"))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(t => (t._2, t._3)).toSet ==
      byDoc(2L).map(t => (t._2, t._3)).toSet)
    assert(byDoc(1L).nonEmpty)
  }

  test("a shared run of w+k-1 chars guarantees a common hash; strangers share none") {
    val shared = "identical stolen paragraph content preserved verbatim here"
    val a = s"totally original opening words $shared and an original ending"
    val b = s"different framing text around $shared with other conclusions"
    // disjoint alphabet (digits only) — zero shared 5-grams by
    // construction; any word text can share an incidental selected gram
    val c = "12345 67890 13579 24680 11223 34455 56677 88990 09876 54321"
    val out = fps(Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"))
    val h = out.groupBy(_._1).map { case (d, v) => d -> v.map(_._3).toSet }
    assert((h(1L) & h(2L)).nonEmpty) // the winnowing guarantee
    assert((h(1L) & h(3L)).isEmpty && (h(2L) & h(3L)).isEmpty)
  }

  test("density: at most one fingerprint per window, at least one per doc; short text kept") {
    val d = Seq((1L, "a short but long enough piece of sample text for density checks"),
      (2L, "tiny")).toDF("doc_id", "text")
    val out = fps(d)
    val byDoc = out.groupBy(_._1)
    val nGrams1 = byDoc(1L).map(_._2).max // positions are 1-based in-range
    assert(byDoc(1L).size <= nGrams1)
    assert(byDoc(2L).size == 1) // shorter than one window → global min
  }
}
