package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer dot product of two `array<bigint>` vectors as one native
  * expression with codegen.
  *
  * The declarative equivalent — `aggregate(zip_with(a, b, (x,y) => x*y),
  * 0L, (acc,x) => acc+x)` — is built from higher-order functions that Spark
  * evaluates interpreted (per-element lambda binding, no whole-stage
  * codegen). For similarity search that cost sits inside the hottest inner
  * loop (|corpus| × |queries| dot products), so it gets the same native
  * treatment as [[WordShingles]].
  *
  * Vectors are expected equal-length (quantized embeddings); if they
  * differ, the overhang is ignored — matching zip_with's shorter-side
  * behavior for the non-null prefix.
  */
case class DotI64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"dot_i64 requires two array<bigint>, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotI64.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.DotI64.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_i64"
}

object DotI64 {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}
