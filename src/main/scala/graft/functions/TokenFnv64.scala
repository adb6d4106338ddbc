package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-token FNV-1a 64 hashes of a text column in one fused pass —
  * semantically `transform(tokensWs(lower(text)), t => fnv1a64(t))`
  * (same tokenizer as [[StopwordHitsExpr]]: lowercase, split on `\s`
  * runs, drop empties; same byte fold as [[Fnv1a64Expr]]), but without
  * the interpreted per-element lambda of the HOF form, and — unlike
  * Spark's murmur/xxhash64 — trivially reproducible in any engine
  * (incl. plain SQL), so signatures built on it can be oracle-checked
  * cross-engine.
  *
  * All tokens are kept, in order (a multiset, not a set): SimHash's
  * per-bit majority vote weights tokens by frequency, unlike the
  * distinct-shingle set [[ShingleHashesExpr]] feeds MinHash.
  */
case class TokenFnv64Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_fnv64 needs string, got $t")
  }

  private def isWs(b: Byte): Boolean = // java regex \s (ASCII)
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Per-row kernel, shared by interpreted eval and generated code. */
  def compute(input: UTF8String): GenericArrayData = {
    val bytes = input.toLowerCase.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        var h = Fnv1a64Expr.Offset
        while (i < n && !isWs(bytes(i))) {
          h = (h ^ (bytes(i) & 0xffL)) * Fnv1a64Expr.Prime
          i += 1
        }
        out.add(h)
      }
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("tokenFnv", this, classOf[TokenFnv64Expr].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenFnv64Expr =
    copy(child = newChild)
}

object TokenFnv64Expr {
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(TokenFnv64Expr(expression(c)))
  }
}
