package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Dedup-key text normalization in one pass — semantically identical
  * to `regexp_replace(lower(trim(text)), "\\s+", " ")` (same operator
  * order: trim strips only 0x20 like SQL `trim`; lowercase via the
  * same UTF8String.toLowerCase the `lower` function uses; then any run
  * of regex-`\s` = ASCII [ \t\n\x0B\f\r] collapses to one space), but
  * without the regex engine per row. */
case class NormalizeTextExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"normalize_text needs string, got $t")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** The per-row kernel, also called from generated code (the codegen
    * emits one virtual call per row but the operator STAYS inside the
    * whole-stage span — unlike CodegenFallback, which would kick the
    * entire projection out of codegen). */
  def compute(input: UTF8String): UTF8String = {
    // trim (spaces only) → lower, exactly like the SQL composition
    val lowered = input.trim.toLowerCase
    val bytes = lowered.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        out(o) = ' '; o += 1
        while (i < n && isWs(bytes(i))) i += 1
      } else {
        out(o) = bytes(i); o += 1; i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("normalizeText", this,
        classOf[NormalizeTextExpr].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object NormalizeTextExpr {
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(NormalizeTextExpr(expression(c)))
  }
}
