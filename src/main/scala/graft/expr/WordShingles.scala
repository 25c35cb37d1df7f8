package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a single-space-tokenized string, as one
  * native expression.
  *
  * Semantically identical to the declarative chain
  * `array_distinct(transform(sequence(...), i => array_join(slice(split(s,
  * " "), i+1, n), " ")))` — but that chain is built from higher-order
  * functions, which Spark evaluates interpreted (no whole-stage codegen,
  * per-element lambda binding). On a 5k-doc corpus the HOF chain costs
  * ~6.5 s; this single-pass loop is the difference between the dedup
  * family being scan-bound vs expression-bound at corpus scale.
  *
  * Contract (must stay aligned with the DuckDB oracle in OracleSql):
  *  - tokens = split on single spaces (input is pre-normalized by
  *    [[graft.dedup.Dedup.normalizeText]], so runs are already collapsed);
  *  - fewer than n tokens → one shingle: the whole token string;
  *  - output order = first occurrence (array_distinct semantics).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1) TypeCheckResult.TypeCheckFailure(s"shingle size must be >= 1, got $n")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"word_shingles requires string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val tokens = str.split(" ", -1)
    val out = new java.util.LinkedHashSet[String]
    if (tokens.length < n) {
      out.add(str)
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= tokens.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}
