package graft.ops

import graft.Cols

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.GraftFunctions

/** The reference's scalar text kernel (SURVEY.md §2.3/§2.4), as pure
  * codegen-friendly Column functions — no UDFs on the hot path.
  */
object TextOps {

  /** T1 — trim every string column (reference: handlers/belarus.py:118-119). */
  def trimAll(df: DataFrame): DataFrame = {
    val projected = df.schema.fields.map { f =>
      if (f.dataType == StringType) trim(Cols.q(f.name)).as(f.name) else Cols.q(f.name)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** T3 — `clean_cell`: null→"", trim, collapse runs of whitespace
    * (reference: handlers/kyrgyzstan.py:169-174).
    */
  def cleanCell(c: Column): Column =
    regexp_replace(trim(coalesce(c, lit(""))), "\\s+", " ")

  /** F2 — `is_new_record`: does the (trimmed) key look like a registry
    * record start, e.g. "№0001/ТЗ" (reference: handlers/kyrgyzstan.py:176-181).
    * Python `re.match` anchors at the start only → translated to a `^` rlike.
    */
  def isNewRecord(c: Column): Column =
    trim(coalesce(c, lit(""))).rlike("^(?:№?\\d{4,})(/ТЗ.*)?")

  /** F1 — `is_excluded`: the row text contains the standalone word
    * "исключен" with arbitrary inter-letter whitespace, case-insensitive,
    * ё folded to е; longer words ("исключение") do not match
    * (reference: utils/gpt.py:39-51).
    *
    * The reference uses lookbehind/lookahead `(?<![а-я])…(?![а-я])`; since
    * the guards are single-char classes, the RE2-safe boundary alternation
    * below is equivalent for boolean matching (and lets the same pattern
    * run in the DuckDB oracle, which lacks lookaround).
    */
  val ExclusionPattern: String =
    "(?:^|[^а-я])и\\s*с\\s*к\\s*л\\s*ю\\s*ч\\s*е\\s*н(?:$|[^а-я])"

  def isExcluded(rowText: Column): Column =
    translate(lower(rowText), "ё", "е").rlike(ExclusionPattern)

  /** T9 — whole-row text concat; concat_ws skips nulls, matching the
    * reference's `if val is not None` filter (utils/gpt.py:399-401).
    */
  def rowConcat(cols: Seq[Column]): Column = concat_ws(" ", cols: _*)

  /** T4 — `preprocess_reg_num` normalization chain, applied in the
    * reference's exact rule order (handlers/kyrgyzstan.py:219-236).
    * All steps are built-in regexp_replace → the whole chain stays in
    * whole-stage codegen and is oracle-checkable.
    */
  def normalizeRegNum(c: Column): Column = {
    var v = trim(coalesce(c, lit("")))
    v = regexp_replace(v, "^№\\s*", "")                 // leading "№"
    v = regexp_replace(v, "\\s*См\\.\\s*", " См. ")     // stabilize "См."
    v = regexp_replace(v, "\\s*[–—]\\s*", "-")          // long dashes → "-"
    v = regexp_replace(v, "\\s*-\\s*", "-")
    v = regexp_replace(v, "\\s*/\\s*", "/")
    v = regexp_replace(v, "\\s*\\.\\s*", ".")
    v = regexp_replace(v, "(?<=\\d)\\s+(?=\\d)", "")    // drop gaps inside numbers
    v = regexp_replace(v, "(См\\.)\\s*(?=\\S)", "$1 ")
    v = regexp_replace(v, "-{2,}", "-")
    v = regexp_replace(v, "\\s+", " ")
    trim(v)
  }

  /** T2 — `clean_text`: null→"", strip, newline removal, whitespace
    * collapse, Unicode NFKC, then drop chars outside the whitelist
    * `[\w\s.,;:№-]` with Unicode-aware `\w` — the `(?U)` flag reproduces
    * Python's re semantics in Java regex
    * (reference: handlers/kazakhstan.py:154-179).
    */
  def cleanText(c: Column): Column = {
    val collapsed = regexp_replace(
      regexp_replace(regexp_replace(trim(coalesce(c, lit(""))), "\n", " "), "\r", ""),
      "\\s{2,}", " ")
    regexp_replace(GraftFunctions.nfkc(collapsed), "(?U)[^\\w\\s\\.,;:№\\-]", "")
  }

  /** T2 applied to every string column, like the reference's
    * all-Utf8-columns map (handlers/kazakhstan.py:171-179).
    */
  def cleanTextAll(df: DataFrame): DataFrame = {
    val projected = df.schema.fields.map { f =>
      if (f.dataType == StringType) cleanText(Cols.q(f.name)).as(f.name) else Cols.q(f.name)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** T5 — LLM prompt sanitization: drop digits, collapse whitespace, drop
    * punctuation-only tokens, truncate to maxLen+"..."
    * (reference: utils/gpt.py:286-302).
    */
  def sanitizePrompt(c: Column, maxLen: Int = 2000): Column = {
    val noDigits = regexp_replace(coalesce(c, lit("")), "\\d+", "")
    val collapsed = trim(regexp_replace(noDigits, "\\s+", " "))
    val punctOnly = "^[!\"#$%&'()*+,\\-./:;<=>?@\\[\\]^_`{|}~]+$"
    val kept = array_join(
      filter(split(collapsed, " "), t => !t.rlike(punctOnly) && t =!= ""), " ")
    when(length(kept) > maxLen, concat(substring(kept, 1, maxLen), lit("...")))
      .otherwise(kept)
  }

  /** T6 — OCR provenance tag handling (utils/gpt.py:418,431). */
  def addRecogTag(c: Column): Column = concat(c, lit(" (RECOG)"))
  def stripRecogTag(c: Column): Column = trim(regexp_replace(c, " \\(RECOG\\)", ""))

  /** T8 — array→", "-joined cell (utils/gpt.py:440-445). */
  def joinSamples(arr: Column): Column = array_join(arr, ", ")

  /** P8 — cast every column to string (handlers/kyrgyzstan.py:273-281). */
  def castAllToString(df: DataFrame): DataFrame =
    df.select(df.columns.toIndexedSeq.map(c => Cols.q(c).cast(StringType).as(c)): _*)
}
