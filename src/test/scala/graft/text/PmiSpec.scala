package graft.text

import graft.SparkSpec

class PmiSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked PMI of the one frequent collocation") {
    // 13 tokens; "new york" ×2, c(new)=c(york)=2 →
    // PMI = ln(2·13 / 4) = ln(6.5) → 1871802 micro-nats
    val d = Seq((1L, "new york is big"), (2L, "new york has people"),
      (3L, "the city is the best")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(d, "doc_id", "text",
      minCount = 2, topK = 10).collect()
    assert(out.length == 1)
    assert((out(0).getString(0), out(0).getString(1),
      out(0).getLong(2), out(0).getLong(3)) == ("new", "york", 2L, 1871802L))
  }

  test("minCount screens the low-frequency tail before scoring") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.pmiCollocations(d, "doc_id", "text",
      minCount = 2, topK = 10).count() == 0L)
  }
}
