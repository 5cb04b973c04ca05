package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stem as a codegen-friendly native expression so index-time
  * stemming of 100 TB of tokens doesn't drop out of WholeStageCodegen.
  */
case class PorterStemExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "porter_stem"

  protected override def nullSafeEval(input: Any): Any =
    PorterStemExpr.stemUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PorterStemExpr.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PorterStemExpr =
    copy(child = newChild)
}

object PorterStemExpr {
  def stemUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.text.Porter.stem(s.toString))
}
