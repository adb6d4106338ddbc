package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-k-shingle xxhash64 values of a text column in one
  * fused pass — semantically `transform(wordShingles(text, k), s =>
  * xxhash64(s))` (same tokenizer: runs of `\s` = ASCII space/tab/
  * newline/VT/FF/CR; same `< k tokens → one whole-text shingle` rule;
  * same distinct-first-occurrence order; same Spark xxhash64 seed 42),
  * but ~100× cheaper: Spark evaluates higher-order-function lambdas
  * interpreted per element, so the expression-DSL form dominated the
  * dedup profile at sf0.1. Interpreted here too (CodegenFallback), but
  * as one tight byte-level loop per document.
  */
case class ShingleHashesExpr(child: Expression, k: Int, seed: Long = 42L,
    fnv: Boolean = false)
    extends UnaryExpression {
  require(k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes needs string, got $t")
  }

  private def isWs(b: Byte): Boolean = // java regex \s (ASCII)
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Per-row kernel, shared by interpreted eval and generated code. */
  def compute(input: UTF8String): GenericArrayData = {
    val bytes = input.getBytes
    // tokenize: (start, end) pairs over non-\s runs
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        starts.add(i)
        while (i < n && !isWs(bytes(i))) i += 1
        ends.add(i)
      }
    }
    val ntok = starts.size()
    val buf = new Array[Byte](n + math.max(0, k - 1))
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    def hashGram(from: Int, until: Int): Unit = { // tokens [from, until)
      var len = 0
      var t = from
      while (t < until) {
        if (t > from) { buf(len) = ' '; len += 1 }
        val s = starts.get(t); val e = ends.get(t)
        System.arraycopy(bytes, s, buf, len, e - s)
        len += e - s
        t += 1
      }
      seen.add(
        if (fnv) { // portable FNV-1a (reproducible in plain SQL oracles)
          var h = Fnv1a64Expr.Offset
          var bi = 0
          while (bi < len) { h = (h ^ (buf(bi) & 0xffL)) * Fnv1a64Expr.Prime; bi += 1 }
          h
        } else XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, seed))
    }
    if (ntok < k) hashGram(0, ntok) // incl. 0 tokens → hash of ""
    else {
      var g = 0
      while (g <= ntok - k) { hashGram(g, g + k); g += 1 }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("shingleHashes", this,
        classOf[ShingleHashesExpr].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleHashesExpr {
  def apply(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(ShingleHashesExpr(expression(c), k))
  }

  /** FNV-1a variant: same shingling, engine-portable hash. */
  def fnv(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(ShingleHashesExpr(expression(c), k, fnv = true))
  }
}
