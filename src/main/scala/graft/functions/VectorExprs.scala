package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector-distance expressions over ArrayType(FloatType) with full
  * whole-stage-codegen support — the hot path of brute-force k-NN
  * (reference semantics: src/vec.rs:232-260 exact scan). A Scala UDF here
  * would box every row; these stay primitive.
  */
abstract class VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def kernel: String

  protected override def nullSafeEval(a: Any, b: Any): Any =
    evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalKernel(a: ArrayData, b: ArrayData): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.$kernel($a, $b)")
}

case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "cosine_sim"
  protected def kernel: String = "cosine"
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = VectorKernels.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "dot_product"
  protected def kernel: String = "dot"
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = VectorKernels.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "l2_distance"
  protected def kernel: String = "l2"
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = VectorKernels.l2(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
