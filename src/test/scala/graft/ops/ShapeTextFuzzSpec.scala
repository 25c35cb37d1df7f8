package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized folds for the shape/text port chains: dedupNames (the
  * counter semantics incl. collisions with already-GENERATED names),
  * promoteHeader end-to-end on random grids (null→UNKNOWN, dup/empty
  * header cells, data rows preserved in index order), and the
  * normalizeRegNum rule chain replayed rule-by-rule through
  * java.util.regex in the documented order — a reorder or a dropped
  * rule in the Spark column chain fails against the fold.
  */
class ShapeTextFuzzSpec extends SparkSpec {
  import spark.implicits._

  // name pool engineered to collide with generated names ("a" dup →
  // "a_1"; a later literal "a_1" must then bump to "a_1_1")
  private val namePool = Seq(
    "a", "b", "c", "a_1", "a_2", "b_1", "", " ", "a ", " b",
    "Unnamed", "Unnamed_1", "Имя", "Имя_1")

  /** Independent fold of the dedupNames contract. */
  private def dedupFold(names: Seq[String]): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    names.foreach { raw =>
      val name = raw.trim
      if (name.nonEmpty && !out.contains(name)) out += name
      else {
        val base = if (name.isEmpty) "Unnamed" else name
        out += Iterator.from(1).map(i => s"${base}_$i")
          .find(c => !out.contains(c)).get
      }
    }
    out.toSeq
  }

  test("fuzz: dedupNames matches the fold and is collision-free on adversarial pools") {
    val rnd = new Random(201)
    for (trial <- 1 to 5) {
      val names = (1 to 8 + rnd.nextInt(10)).map(_ => namePool(rnd.nextInt(namePool.size)))
      val got = ShapeOps.dedupNames(names)
      assert(got == dedupFold(names), s"trial $trial: $names -> $got")
      assert(got.distinct == got, s"trial $trial: duplicate outputs in $got")
      assert(got.forall(_.trim.nonEmpty), s"trial $trial: empty output in $got")
    }
  }

  test("fuzz: promoteHeader on random grids — names from row 0, data preserved in order") {
    val rnd = new Random(202)
    for (trial <- 1 to 3) {
      val nCols = 3 + rnd.nextInt(3)
      val nRows = 4 + rnd.nextInt(6)
      val cellPool = namePool ++ Seq(null, "v1", "v2")
      val grid = (0 until nRows).map(r =>
        (0 until nCols).map(_ => cellPool(rnd.nextInt(cellPool.size))))
      val df = grid.zipWithIndex
        .map { case (cells, i) => (i.toLong, cells) }
        .toDF("_seq", "cells")
        .select(col("_seq") +: (0 until nCols).map(j =>
          col("cells").getItem(j).as(s"c$j")): _*)
      val indexed = ShapeOps.withIndex(df, col("_seq")).drop("_seq")
      val promoted = ShapeOps.promoteHeader(indexed)
      val expectedNames = ShapeOps.dedupNames(
        grid.head.map(v => Option(v).getOrElse("UNKNOWN")))
      assert(promoted.columns.filter(_ != ShapeOps.IndexCol).toSeq == expectedNames,
        s"trial $trial: header names diverged")
      val gotRows = promoted.orderBy(col(ShapeOps.IndexCol))
        .select(expectedNames.map(graft.Cols.q): _*)
        .collect().map(_.toSeq.map(Option(_).map(_.toString).orNull)).toSeq
      assert(gotRows == grid.tail.map(_.map(v => v: String)),
        s"trial $trial: data rows diverged")
    }
  }

  /** Spark's trim strips ASCII SPACES only — java .trim also strips
    * \t\n\r and other control chars, a real divergence on inputs with
    * newline edges, so the folds must use the Spark semantics.
    */
  private def sparkTrim(s: String): String = s.replaceAll("^ +| +$", "")

  /** The normalizeRegNum chain as plain java.util.regex, rule by rule in
    * the documented order (kyrgyzstan.py:219-236 port).
    */
  private def regNumFold(s0: String): String = {
    var v = sparkTrim(Option(s0).getOrElse(""))
    v = v.replaceAll("^№\\s*", "")
    v = v.replaceAll("\\s*См\\.\\s*", " См. ")
    v = v.replaceAll("\\s*[–—]\\s*", "-")
    v = v.replaceAll("\\s*-\\s*", "-")
    v = v.replaceAll("\\s*/\\s*", "/")
    v = v.replaceAll("\\s*\\.\\s*", ".")
    v = v.replaceAll("(?<=\\d)\\s+(?=\\d)", "")
    v = v.replaceAll("(См\\.)\\s*(?=\\S)", "$1 ")
    v = v.replaceAll("-{2,}", "-")
    v = v.replaceAll("\\s+", " ")
    sparkTrim(v)
  }

  test("fuzz: normalizeRegNum column chain matches the java-regex fold rule-for-rule") {
    val rnd = new Random(203)
    val atoms = Seq("№", " ", "  ", "-", "–", "—", "/", ".", "См.", "см.",
      "12", "345", "7", "А", "бв", "x", "")
    for (trial <- 1 to 4) {
      val inputs = (1 to 60).map { _ =>
        (1 to 2 + rnd.nextInt(8)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
      } :+ null
      val got = inputs.toDF("x")
        .select(TextOps.normalizeRegNum(col("x")).as("n"))
        .collect().map(_.getString(0)).toSeq
      val want = inputs.map(regNumFold)
      val diffs = inputs.zip(got.zip(want)).filter { case (_, (g, w)) => g != w }
      assert(diffs.isEmpty, s"trial $trial: ${diffs.take(3)}")
    }
  }

  /** cleanText as plain JVM ops: strip → newline removal → whitespace
    * collapse → NFKC → Unicode-aware whitelist (Python (?U)\w parity).
    */
  private def cleanTextFold(s0: String): String = {
    var v = sparkTrim(Option(s0).getOrElse(""))
    v = v.replace("\n", " ").replace("\r", "")
    v = v.replaceAll("\\s{2,}", " ")
    v = java.text.Normalizer.normalize(v, java.text.Normalizer.Form.NFKC)
    v.replaceAll("(?U)[^\\w\\s\\.,;:№\\-]", "")
  }

  test("fuzz: cleanText column chain matches the JVM fold incl. NFKC") {
    val rnd = new Random(204)
    val atoms = Seq("abc", "ДЕФ", "１２３" /* fullwidth */, "ﬁ" /* ligature */,
      "№5", "a\nb", "x\r\n", "  ", "*", "€", "—", "é", "☂", ".,;:", "_", "")
    for (trial <- 1 to 4) {
      val inputs = (1 to 60).map { _ =>
        (1 to 2 + rnd.nextInt(7)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
      } :+ null
      val got = inputs.toDF("x")
        .select(TextOps.cleanText(col("x")).as("n"))
        .collect().map(_.getString(0)).toSeq
      val want = inputs.map(cleanTextFold)
      val diffs = inputs.zip(got.zip(want)).filter { case (_, (g, w)) => g != w }
      assert(diffs.isEmpty, s"trial $trial: ${diffs.take(3)}")
    }
  }

  /** sanitizePrompt as plain JVM ops: digits out, whitespace collapse,
    * punct-only token drop, maxLen+"..." truncation.
    */
  private def sanitizeFold(s0: String, maxLen: Int): String = {
    val noDigits = Option(s0).getOrElse("").replaceAll("\\d+", "")
    val collapsed = sparkTrim(noDigits.replaceAll("\\s+", " "))
    val punctOnly = "^[!\"#$%&'()*+,\\-./:;<=>?@\\[\\]^_`{|}~]+$".r
    val kept = collapsed.split(" ", -1)
      .filter(t => t.nonEmpty && punctOnly.findFirstIn(t).isEmpty)
      .mkString(" ")
    if (kept.length > maxLen) kept.substring(0, maxLen) + "..." else kept
  }

  test("fuzz: sanitizePrompt column chain matches the JVM fold incl. truncation") {
    val rnd = new Random(205)
    val atoms = Seq("word", "слово", "123", "a1b2", "...", "?!", "-", "(x)",
      " ", "  ", "№", "", "longtokenlongtoken")
    for (trial <- 1 to 4) {
      val maxLen = Seq(10, 25, 2000, 6)(trial - 1) // truncation must bite
      val inputs = (1 to 50).map { _ =>
        (1 to 2 + rnd.nextInt(8)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString(" ")
      } :+ null
      val got = inputs.toDF("x")
        .select(TextOps.sanitizePrompt(col("x"), maxLen).as("n"))
        .collect().map(_.getString(0)).toSeq
      val want = inputs.map(sanitizeFold(_, maxLen))
      val diffs = inputs.zip(got.zip(want)).filter { case (_, (g, w)) => g != w }
      assert(diffs.isEmpty, s"trial $trial (maxLen $maxLen): ${diffs.take(3)}")
    }
  }

  /** cleanColumnName as plain JVM ops in the documented rule order. */
  private def cleanNameFold(s0: String): String = {
    var n = s0.trim
    n = n.replaceAll("Наименова\\s*ние", "Наименование")
    n = n.replace("/", " или ")
    n = n.replace("\n", " ")
    n = n.replaceAll("\\s{2,}", " ")
    n.filter(ch => !Character.isISOControl(ch) && Character.isDefined(ch))
  }

  test("fuzz: cleanColumnName matches the JVM fold on adversarial names") {
    val rnd = new Random(206)
    val atoms = Seq("Наименова ние", "Наименование", "Наименова\nние", "a/b",
      "x", "\n", "\t", "  ", "№", "col", "", "", "Имя/Фамилия")
    for (trial <- 1 to 5) {
      val name = (1 to 1 + rnd.nextInt(6)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
      assert(ShapeOps.cleanColumnName(name) == cleanNameFold(name),
        s"trial $trial: '$name'")
    }
  }
}
