package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token count + per-list stopword hit counts in one pass:
  * returns `[nTokens, hits(list 0), hits(list 1), ...]` over the
  * lowercased, `\s`-tokenized text — the shared scan behind language
  * ID (evidence per language) and stopword-ratio quality signals.
  * One tokenization instead of one per language; membership via a
  * hash set per list. Tokenizer and lowercasing match
  * `tokensWs(lower(text))` exactly.
  */
case class StopwordHitsExpr(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"stopword_hits needs string, got $t")
  }

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    lists.map { l =>
      val s = new java.util.HashSet[UTF8String]()
      l.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Per-row kernel, shared by interpreted eval and generated code. */
  def compute(input: UTF8String): GenericArrayData = {
    val lowered = input.toLowerCase
    val bytes = lowered.getBytes
    val n = bytes.length
    val out = new Array[Int](1 + sets.length)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        out(0) += 1
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(tok)) out(j + 1) += 1
          j += 1
        }
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("stopwordHits", this,
        classOf[StopwordHitsExpr].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): StopwordHitsExpr =
    copy(child = newChild)
}

object StopwordHitsExpr {
  def apply(c: Column, lists: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(StopwordHitsExpr(expression(c), lists))
  }
}
