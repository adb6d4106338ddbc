package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
  * MOSS algorithm): hash every char k-gram, slide a window of `w`
  * hashes, keep each window's minimum (rightmost on ties), emit the
  * distinct minima. Guarantee: any shared substring of length
  * ≥ w + k − 1 between two documents yields at least one shared
  * fingerprint — so *partial* overlap (a copied paragraph) is
  * detectable where whole-document hashes (FNV fingerprint, simhash)
  * only catch near-total duplication.
  *
  * One byte-level pass per document; k-gram hashes are FNV-1a over the
  * raw bytes (portable). Callers normalize first
  * ([[NormalizeTextExpr]]) so whitespace/case don't perturb grams.
  */
case class WinnowExpr(child: Expression, k: Int, window: Int)
    extends UnaryExpression {
  require(k >= 2 && window >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow needs string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Per-row kernel, shared by interpreted eval and generated code. */
  def compute(input: UTF8String): GenericArrayData = {
    val bytes = input.getBytes
    val n = bytes.length
    if (n < k) {
      // degenerate doc: single fingerprint of the whole text
      return new GenericArrayData(Array(Fnv1a64Expr.hash(bytes)))
    }
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = Fnv1a64Expr.Offset
      var j = 0
      while (j < k) {
        h = (h ^ (bytes(i + j) & 0xffL)) * Fnv1a64Expr.Prime
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (nGrams <= window) {
      // one window over everything
      var best = 0
      i = 1
      while (i < nGrams) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
      seen.add(hashes(best))
    } else {
      var prevBest = -1
      var start = 0
      while (start + window <= nGrams) {
        var best = start
        i = start + 1
        while (i < start + window) { // rightmost minimum
          if (hashes(i) <= hashes(best)) best = i
          i += 1
        }
        if (best != prevBest) { seen.add(hashes(best)); prevBest = best }
        start += 1
      }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowExpr].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {
  def apply(c: Column, k: Int, window: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(WinnowExpr(expression(c), k, window))
  }
}
