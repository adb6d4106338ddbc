package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built from
  * codegen'd native functions (`zip_with`/`aggregate`) — no UDFs, so the
  * expressions stay inside whole-stage codegen and compute identically
  * in any engine that folds left-to-right (matters for oracle parity).
  */
object VectorFunctions {

  /** Element-wise dot product in double precision: fused codegen'd
    * loop ([[DotProductExpr]]) — bit-identical to the
    * `aggregate(zip_with(...))` formulation (left-to-right sum) but
    * with no per-row zipped-array allocation. */
  def dot(a: Column, b: Column): Column =
    DotProductExpr(a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, norm(a), norm(b))

  /** Cosine with pre-computed norms — same arithmetic
    * (dot / (|a|·|b|)), but lets a pair join compute each side's norm
    * once instead of per pair. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val d = dot(a, b)
    val den = na * nb
    when(den === 0.0, lit(null)).otherwise(d / den)
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Random-hyperplane LSH signature: sign bits of dot products against
    * `planes` (deterministically seeded), packed into a Long. Buckets
    * cosine-similar vectors together — the scale path for ANN (§2 north
    * star): candidates come from a hash-partitioned equi-join on the
    * bucket id instead of a cross join.
    */
  def hyperplaneSig(vec: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.nonEmpty && planes.size <= 63)
    // one fused expression with the matrix riding as a reference
    // constant — the per-plane when(dot(vec, array(lit…)))-chain it
    // replaces planted nPlanes×dim Literal nodes in the plan (~3.6k
    // nodes at 56×64, rendered at 150-475 KB per AQE plan update);
    // arithmetic and null semantics are reproduced bit-for-bit, see
    // [[HyperplaneSigExpr]]
    HyperplaneSigExpr(vec, planes)
  }

  /** Deterministic pseudo-random unit-ish planes (xorshift-seeded). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
