package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization as a native Catalyst expression.
  *
  * Spark has no NFKC built-in; the reference pipeline NFKC-normalizes every
  * string cell (reference: handlers/kazakhstan.py:163). A Scala UDF would
  * work but blocks whole-stage codegen; this expression participates in
  * codegen via a static helper, so the surrounding projection stays in one
  * generated function.
  */
case class NfkcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NfkcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NfkcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfkc"
}

object NfkcNormalize {
  /** Static entry point shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFKC))
}
