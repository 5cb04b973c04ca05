package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a (distinct) shingle array in ONE scalar pass:
  * slot i is min over shingles of (PermA(i)·polyHash(s) + PermB(i)) mod M.
  *
  * Value-identical to the explode → groupBy(min × 16) formulation for
  * NON-EMPTY input (min is order-independent); an empty array yields the
  * [Long.MaxValue × 16] sentinel where the groupBy form emitted no row —
  * callers must drop empty shingle sets first (Dedup.minhashSignatures
  * does). The signature build is narrow — no explode, no shuffle;
  * MinHash+LSH's only shuffle is then the (band, key) candidate join.
  * Same motivation and shape as SimHash64Expr.
  */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigExpr.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  def signature(shingles: ArrayData): ArrayData = {
    val k = HashUtil.NumPerms
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = HashUtil.polyHash(shingles.getUTF8String(i))
      var j = 0
      while (j < k) {
        val v = (HashUtil.PermA(j) * h + HashUtil.PermB(j)) % HashUtil.Mod
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
