package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingles over a token array: output i is
  * tokens[i..i+n-1] joined by single spaces; empty when there are fewer
  * than n tokens. Semantics identical to the
  * `transform(sequence(...), i -> array_join(slice(toks, i+1, n), " "))`
  * formulation it replaces.
  *
  * Exists for the same reason as TokenizeExpr: the lambda-HOF pipeline
  * runs interpreted whenever Catalyst copies it into Filter nodes (e.g.
  * generator constraints like `size(shingles) > 0` pushed below a
  * Generate re-derive the whole chain per row), and the HOF allocates a
  * lambda frame per element. This is one linear pass in whole-stage
  * codegen, cheap enough that constraint-duplicated evaluation no longer
  * matters.
  */
case class WordShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  protected override def nullSafeEval(toks: Any, n: Any): Any =
    WordShinglesExpr.shingles(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.WordShinglesExpr.shingles($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShinglesExpr =
    copy(left = newLeft, right = newRight)
}

object WordShinglesExpr {
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    var i = 0
    while (i <= sz - n) {
      val sb = new java.lang.StringBuilder(16 * n)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
