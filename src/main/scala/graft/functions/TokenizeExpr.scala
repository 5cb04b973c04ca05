package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer (reference semantics src/lex.rs:416-431): lowercase,
  * token chars are [a-z0-9&@+/_], a token must contain at least one
  * alphanumeric.
  *
  * Exists because the equivalent `filter(split(lower(c), re), _.rlike(re))`
  * pipeline drops to interpreted evaluation inside Filter nodes (lambda
  * HOFs don't codegen there) and recompiles regexes per row — measured
  * ~50× slower on the dedup path. This is a single char scan with
  * whole-stage codegen.
  */
case class TokenizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  protected override def nullSafeEval(input: Any): Any =
    TokenizeExpr.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeExpr.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
}

object TokenizeExpr {
  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
    c == '&' || c == '@' || c == '+' || c == '/' || c == '_'

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  def tokenize(s: UTF8String): ArrayData = {
    val str = s.toString.toLowerCase
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = str.length
    val sb = new java.lang.StringBuilder(16)
    var hasAlnum = false
    while (i <= n) {
      val c = if (i < n) str.charAt(i) else ' '
      if (i < n && isTokenChar(c)) {
        sb.append(c)
        if (isAlnum(c)) hasAlnum = true
      } else if (sb.length() > 0) {
        if (hasAlnum) out.add(UTF8String.fromString(sb.toString))
        sb.setLength(0)
        hasAlnum = false
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
