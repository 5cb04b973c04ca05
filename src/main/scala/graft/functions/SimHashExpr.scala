package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash over a token array — the reference's per-document sketch
  * build (src/types/sketch_track.rs:549-580) as ONE scalar pass: token
  * hash h64 = polyHash(t)·(2³¹−1) + polyHash(t‖"!"), bit j accumulates
  * ±1 per occurrence by h64's bit parity, bit set when the sum is
  * positive.
  *
  * Bit-identical to the previous explode → 60-aggregate-column → groupBy
  * formulation (integer addition is associative/commutative), but the
  * sketch build is now NARROW: no explode, no shuffle, embarrassingly
  * parallel over 100 TB — the shuffle that remains in dedup is only the
  * banded candidate join, as it should be.
  */
case class SimHash64Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(toks: Any, bits: Any): Any =
    SimHash64Expr.simhash(toks.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.SimHash64Expr.simhash($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHash64Expr =
    copy(left = newLeft, right = newRight)
}

object SimHash64Expr {
  def simhash(toks: ArrayData, bits: Int): Long = {
    val sums = new Array[Long](bits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h1 = HashUtil.polyHash(toks.getUTF8String(i))
      // polyHash(t ++ "!") = (polyHash(t)*31 + '!') mod M — same fold step
      val h2 = (h1 * 31 + '!'.toLong) % HashUtil.Mod
      val h64 = h1 * 2147483647L + h2
      var j = 0
      while (j < bits) {
        sums(j) += (if (((h64 >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
