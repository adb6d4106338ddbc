package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All the counting behind the text-quality signals in ONE byte pass
  * (plus one over the lowercased bytes for the stopword compare),
  * replacing ~8 separate regex splits and interpreted HOF lambdas per
  * row:
  *
  *   - nTok      tokens of the RAW text (`\s`-runs split, empties out)
  *   - sumTokLen Σ token length in code points (== `aggregate(toks,
  *               0L, acc + length(t))`)
  *   - nChars    code points of the whole text (== `length(text)`)
  *   - punct     chars matching java-regex `\p{Punct}` (the ASCII
  *               POSIX punct class — exactly what
  *               `regexp_replace(text, "\\p{Punct}", "")` removes)
  *   - nTokLower tokens of the LOWERCASED text (the denominator
  *               `stopwordRatio` uses)
  *   - hits      lowercased tokens found in the stopword list
  *
  * The ratio/score FORMULAS stay in Column arithmetic on this struct,
  * so their double-precision results are bit-identical to the
  * composed formulation (and to the cross-engine oracle).
  */
case class TextStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("nTok", IntegerType, nullable = false),
    StructField("sumTokLen", LongType, nullable = false),
    StructField("nChars", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("nTokLower", IntegerType, nullable = false),
    StructField("hits", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"text_stats needs string, got $t")
  }

  @transient private lazy val swSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  private def isWs(b: Byte): Boolean = // java regex \s (ASCII)
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def isPunct(b: Byte): Boolean = { // java regex \p{Punct} (ASCII)
    val c = b & 0xFF
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')
  }

  // a UTF-8 continuation byte does not start a code point
  private def isCharStart(b: Byte): Boolean = (b & 0xC0) != 0x80

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Per-row kernel, shared by interpreted eval and generated code. */
  def compute(input: UTF8String): InternalRow = {
    val bytes = input.getBytes
    val n = bytes.length
    var nTok = 0
    var sumTokLen = 0L
    var nChars = 0
    var punct = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (isCharStart(b)) {
        nChars += 1
        if (isPunct(b)) punct += 1
      }
      i += 1
    }
    i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        nTok += 1
        while (i < n && !isWs(bytes(i))) {
          if (isCharStart(bytes(i))) sumTokLen += 1
          i += 1
        }
      }
    }
    // lowered pass (the composed form tokenizes lower(text) separately)
    val lowered = input.toLowerCase.getBytes
    val m = lowered.length
    var nTokLower = 0
    var hits = 0
    i = 0
    while (i < m) {
      while (i < m && isWs(lowered(i))) i += 1
      if (i < m) {
        val start = i
        while (i < m && !isWs(lowered(i))) i += 1
        nTokLower += 1
        if (swSet.contains(UTF8String.fromBytes(lowered, start, i - start)))
          hits += 1
      }
    }
    InternalRow(nTok, sumTokLen, nChars, punct, nTokLower, hits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("textStats", this, classOf[TextStatsExpr].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {
  def apply(c: Column, stopwords: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(TextStatsExpr(expression(c), stopwords))
  }
}
