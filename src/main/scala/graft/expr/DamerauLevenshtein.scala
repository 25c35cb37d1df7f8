package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein distance as a native Catalyst
  * expression with codegen.
  *
  * Spark ships `levenshtein` but no transposition-aware edit distance;
  * record-linkage comparators want one because character swaps are the
  * single most common typo class in hand-keyed identifiers. This is the
  * FULL Damerau distance (Lowrance–Wagner '75: a transposed pair may be
  * separated by later edits — distance("ca","abc") = 2), not the cheaper
  * optimal-string-alignment variant (which would give 3); DuckDB's
  * `damerau_levenshtein` computes the same function, which is what makes
  * the operator oracle-able.
  *
  * Distances are over Unicode code points, matching both engines'
  * character (not byte) semantics for `levenshtein`. Cost is O(n·m) time
  * and memory per pair — the comparator belongs AFTER blocking (sorted
  * neighborhood / LSH), on candidate pairs of short fields, never as a
  * corpus cross-join; [[graft.dedup.Dedup]]'s linkage chain is the
  * intended caller.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"damerau_levenshtein requires two strings, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.DamerauLevenshtein.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "damerau_levenshtein"
}

object DamerauLevenshtein {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(sa: UTF8String, sb: UTF8String): Long = {
    val a = sa.toString.codePoints().toArray
    val b = sb.toString.codePoints().toArray
    val n = a.length
    val m = b.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    // (n+2)×(m+2) matrix with the Lowrance–Wagner sentinel border; the
    // transposition term reaches back to arbitrary earlier rows, so no
    // rolling-row reduction exists for the unrestricted distance.
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    // last row index at which each code point occurred in `a`
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1 = da.getOrDefault(b(j - 1), 0)
        val j1 = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        var best = d(i)(j) + cost                    // substitute / match
        val ins = d(i + 1)(j) + 1                    // insert
        if (ins < best) best = ins
        val del = d(i)(j + 1) + 1                    // delete
        if (del < best) best = del
        val tr = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1) // transpose
        if (tr < best) best = tr
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1).toLong
  }
}
