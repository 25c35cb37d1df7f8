package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit Morton (Z-order) key of two non-negative 32-bit coordinates —
  * the multi-dimensional clustering key behind ZORDER-style layout
  * optimization: sorting a table by `z_order2(scale(a), scale(b))` before
  * writing keeps rows close in BOTH dimensions inside the same Parquet
  * row groups, so min/max stats prune scans for predicates on EITHER
  * column (a plain sort only skips on its leading column). See
  * [[graft.sources.Stage.writeZOrdered]] for the end-to-end layout pass.
  *
  * Bit `i` of `a` lands at position `2i`, bit `i` of `b` at `2i+1`; the
  * classic interleave-by-magic-masks, one native codegen'd expression.
  * Inputs are truncated to their lower 32 bits and must be non-negative
  * for the curve to be order-meaningful (scale/rank first).
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"z_order2 requires two bigint, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ZOrder2.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_order2"
}

object ZOrder2 {

  /** Spread the lower 32 bits of `v` to even bit positions. */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}
