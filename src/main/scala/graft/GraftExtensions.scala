package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions: register via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `withExtensions(new GraftExtensions)`) and every custom expression
  * is a plain SQL function —
  *
  * {{{
  *   SELECT graft_fnv64(text), graft_simhash64(graft_shingle_hashes(text, 3))
  *   FROM docs WHERE graft_zint_decode64(price_z) > 100
  * }}}
  *
  * This is the idiomatic Spark extension point (the same mechanism a
  * catalog or optimizer rule would use); expressions registered here
  * participate in codegen exactly like built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_fnv64"),
      info("graft_fnv64", "FNV-1a 64 of a string's UTF-8 bytes"),
      (args: Seq[Expression]) => Fnv1a64Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "simhash of an array<bigint> of token hashes"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two array<double>"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "distinct word-k-shingle xxhash64 values"),
      (args: Seq[Expression]) => ShingleHashesExpr(args(0),
        args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_normalize_text"),
      info("graft_normalize_text", "trim+lower+collapse-whitespace"),
      (args: Seq[Expression]) => NormalizeTextExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "winnowing fingerprints (text, k, window)"),
      (args: Seq[Expression]) => WinnowExpr(args(0),
        args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_token_fnv64"),
      info("graft_token_fnv64", "per-token FNV-1a 64 hashes (portable)"),
      (args: Seq[Expression]) => TokenFnv64Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_shingle_fnv"),
      info("graft_shingle_fnv", "distinct word-k-shingle FNV-1a hashes (portable)"),
      (args: Seq[Expression]) => ShingleHashesExpr(args(0),
        args(1).eval().asInstanceOf[Int], fnv = true)))
  }
}
