package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature in one pass: for raw shingle hashes h (reduced
  * to pmod(h, p) first) and permutation coefficients (a_j, b_j),
  * sig_j = min_i (a_j·pmod(h_i) + b_j) mod p.
  *
  * The expression-DSL formulation (`numHashes` separate
  * `array_min(transform(...))` folds) materializes `numHashes`
  * intermediate arrays per document; this computes the whole signature
  * in a single j×i loop with one output allocation. Same arithmetic,
  * same coefficients → identical signatures. p is 2^31-1 so a·h+b
  * stays < 2^62 (ANSI-safe).
  */
case class MinHashSigExpr(child: Expression, coefsA: Seq[Long],
    coefsB: Seq[Long], p: Long) extends UnaryExpression {
  require(coefsA.length == coefsB.length && coefsA.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash needs array<bigint>, got $t")
  }

  private lazy val aArr = coefsA.toArray
  private lazy val bArr = coefsB.toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = aArr.length
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var best = p // sentinel: empty input → p (no shingle evidence)
      var i = 0
      while (i < n) {
        if (!hs.isNullAt(i)) {
          val hm = ((hs.getLong(i) % p) + p) % p // pmod of the raw hash
          val v = (aArr(j) * hm + bArr(j)) % p
          if (v < best) best = v
        }
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val best = ctx.freshName("best"); val v = ctx.freshName("v")
      val hm = ctx.freshName("hm")
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[${aArr.length}];
         |for (int $j = 0; $j < ${aArr.length}; $j++) {
         |  long $best = ${p}L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$hs.isNullAt($i)) {
         |      long $hm = (($hs.getLong($i) % ${p}L) + ${p}L) % ${p}L;
         |      long $v = ($aRef[$j] * $hm + $bRef[$j]) % ${p}L;
         |      if ($v < $best) $best = $v;
         |    }
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  def apply(c: Column, a: Seq[Long], b: Seq[Long], p: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(MinHashSigExpr(expression(c), a, b, p))
  }
}
