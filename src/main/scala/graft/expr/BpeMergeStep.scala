package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step (Sennrich et al. '16 §3.2, learn_bpe's replace
  * pass): greedy left-to-right single-pass merge of every adjacent
  * (left, right) symbol pair in an array<string> symbol sequence —
  * `[a a a]` under (a, a) becomes `[aa a]`, never `[a aa]`, and a
  * consumed right symbol cannot start another match in the same pass.
  *
  * This is the training loop's per-word state transition: the trainer
  * holds the word-TYPE relation (vocabulary-sized, not corpus-sized)
  * and applies the elected pair to every word in one projection. The
  * pair is fixed per expression instance (plan literal), so codegen
  * sees a branch-free static call.
  *
  * Determinism: pure function of (symbols, left, right); the DuckDB
  * oracle replays the same greedy rule relationally (match islands on
  * consecutive positions keep even offsets — provably the single-pass
  * scan, see OracleSql's bpeCtes).
  */
case class BpeMergeStep(child: Expression, left: String, right: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val pair =
    (UTF8String.fromString(left), UTF8String.fromString(right))

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.isEmpty || right.isEmpty)
      TypeCheckResult.TypeCheckFailure("bpe_merge_step needs non-empty pair halves")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_step requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    BpeMergeStep.compute(input.asInstanceOf[ArrayData], pair._1, pair._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeLeft", pair._1, classOf[UTF8String].getName)
    val r = ctx.addReferenceObj("bpeRight", pair._2, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c => s"graft.expr.BpeMergeStep.compute($c, $l, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeStep =
    copy(child = newChild)

  override def prettyName: String = "bpe_merge_step"
}

object BpeMergeStep {
  def compute(syms: ArrayData, left: UTF8String, right: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      val s = syms.getUTF8String(i)
      if (i + 1 < n && s.equals(left) && syms.getUTF8String(i + 1).equals(right)) {
        out.add(UTF8String.concat(left, right))
        i += 2
      } else {
        out.add(s)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}
