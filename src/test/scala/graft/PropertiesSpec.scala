package graft

import graft.ops.TextOps
import graft.expr.{RollingHash64, SimHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen

/** Property tests (SURVEY.md §5.2): normalizer idempotence and fingerprint
  * algebra, driven through the actual Spark expressions in one batched
  * evaluation per property (not per-sample Spark jobs). Samples come from
  * ScalaCheck generators with a fixed seed-independent draw; assertions run
  * over every sample (scalatestplus bridge isn't on the offline classpath,
  * so sampling is explicit).
  */
class PropertiesSpec extends SparkSpec {

  private def samplesOf[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(_ => g.sample)
  import spark.implicits._

  private val messyText: Gen[String] = for {
    words <- Gen.listOfN(8, Gen.oneOf(
      "№", "1234", "ТЗ", "См.", "—", "-", "/", ".", "abc", "товар", " ", "12 34"))
    seps <- Gen.listOfN(8, Gen.oneOf(" ", "  ", "\t", ""))
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  test("property: normalizeRegNum is idempotent unless output re-exposes a leading №") {
    // The reference strips exactly one leading № per application
    // (kyrgyzstan.py:221 anchors at ^), so "№№…" inputs converge only after
    // several passes — parity demands we preserve that, hence the filter.
    val samples = Gen.listOfN(100, messyText).sample.get
    val df = samples.toDF("x")
      .select(TextOps.normalizeRegNum(col("x")).as("once"))
      .select(col("once"), TextOps.normalizeRegNum(col("once")).as("twice"))
    df.collect().filterNot(_.getString(0).startsWith("№")).foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"not idempotent: '${r.getString(0)}' → '${r.getString(1)}'")
    }
  }

  test("property: cleanCell is idempotent") {
    val samples = Gen.listOfN(100, Gen.asciiPrintableStr).sample.get
    val df = samples.toDF("x")
      .select(TextOps.cleanCell(col("x")).as("once"))
      .select(col("once"), TextOps.cleanCell(col("once")).as("twice"))
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("property: rolling hash distributes over concatenation (Karp-Rabin identity)") {
    // h(a ++ b) = h(a) * B^len(b) + h(b)  (mod 2^64)
    val pairs = samplesOf(Gen.zip(Gen.asciiStr, Gen.asciiStr))
    pairs.foreach { case (a, b) =>
      val ha = RollingHash64.compute(UTF8String.fromString(a))
      val hb = RollingHash64.compute(UTF8String.fromString(b))
      val hab = RollingHash64.compute(UTF8String.fromString(a + b))
      val bLen = UTF8String.fromString(b).getBytes.length
      var pow = 1L
      (0 until bLen).foreach(_ => pow *= RollingHash64.Base)
      assert(hab == ha * pow + hb)
    }
  }

  test("property: simhash of a permuted token bag is identical (bag semantics)") {
    samplesOf(Gen.listOfN(10, Gen.alphaNumStr.suchThat(_.nonEmpty)), 50).foreach { toks =>
      val h1 = SimHash64.computeStrings(toks)
      val h2 = SimHash64.computeStrings(scala.util.Random.shuffle(toks))
      assert(h1 == h2)
    }
  }

  test("property: redactPii is idempotent (placeholders contain no PII patterns)") {
    val piiText: Gen[String] = for {
      parts <- Gen.listOfN(6, Gen.oneOf(
        "hi", "a@b.co", "x 10.0.0.1 y", "http://e.org/p?q=1", "+7 916 123-45-67",
        "user.name+x@mail.example.org", "192.168.1.255", "plain 2024 text",
        "https://a.b/c a@b.c"))
    } yield parts.mkString(" ")
    val xs = samplesOf(piiText)
    val out = xs.toDF("x")
      .select(graft.text.TextAnalysis.redactPii(col("x")).as("r1"))
      .select(col("r1"), graft.text.TextAnalysis.redactPii(col("r1")).as("r2"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not idempotent: '${r.getString(0)}' -> '${r.getString(1)}'"))
  }

  test("property: hashSplit partitions every row into exactly one split, stable across evals") {
    val ids = (0L until 3000L).toDF("id")
    val s1 = ids.select(graft.text.TextAnalysis.hashSplit(col("id"), 70, 20).as("s"))
      .collect().map(_.getString(0))
    val s2 = ids.select(graft.text.TextAnalysis.hashSplit(col("id"), 70, 20).as("s"))
      .collect().map(_.getString(0))
    assert(s1.sameElements(s2))
    assert(s1.forall(Set("train", "val", "test")))
    // bucket identity: split is a pure function of the bucket
    val both = ids.select(
      graft.text.TextAnalysis.hashBucket(col("id"), 100).as("b"),
      graft.text.TextAnalysis.hashSplit(col("id"), 70, 20).as("s")).collect()
    both.foreach { r =>
      val expect = if (r.getLong(0) < 70) "train" else if (r.getLong(0) < 90) "val" else "test"
      assert(r.getString(1) == expect)
    }
  }

  test("property: exclusion flag invariant under case and ё/е spelling") {
    val phrases = Seq("товар исключен", "ТОВАР ИСКЛЮЧЕН", "товар исключЁн — нет",
      "исключение", "обычная запись")
    val df = phrases.toDF("x").select(col("x"),
      TextOps.isExcluded(col("x")).as("f"),
      TextOps.isExcluded(upper(col("x"))).as("fu"))
    df.collect().foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2),
        s"case instability on '${r.getString(0)}'")
    }
  }
}
