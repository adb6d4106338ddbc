package graft

import graft.functions.{Fnv1a64Expr, ShingleHashesExpr, TokenFnv64Expr}
import graft.sources.Dbf
import org.apache.spark.sql.functions._

/** The portable (FNV-based) hash paths that back the cross-engine
  * oracles: the fused expressions must equal their composed
  * expression-DSL formulations, and the DBF sink must round-trip. */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick  brown fox\tjumps over the lazy dog"),
    (2L, "  leading and trailing  "),
    (3L, "one"),
    (4L, ""),
    (5L, "MiXeD Case TOKENS mixed case tokens")
  ).toDF("doc_id", "text")

  test("TokenFnv64Expr == transform(tokensWs(lower(text)), fnv1a64)") {
    val composed = docs.select(col("doc_id"),
      transform(
        filter(split(lower(col("text")), "\\s+"), t => length(t) > 0),
        t => Fnv1a64Expr(t)).as("h"))
    val fused = docs.select(col("doc_id"), TokenFnv64Expr(col("text")).as("h"))
    assert(fused.orderBy("doc_id").collect().map(_.getSeq[Long](1)).toSeq ==
      composed.orderBy("doc_id").collect().map(_.getSeq[Long](1)).toSeq)
  }

  test("ShingleHashesExpr.fnv == distinct fnv1a64 over composed word shingles") {
    val k = 3
    val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val grams = when(size(toks) < k, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
    val composed = docs.select(col("doc_id"),
      array_distinct(transform(grams, g => Fnv1a64Expr(g))).as("h"))
    val fused = docs.select(col("doc_id"),
      ShingleHashesExpr.fnv(col("text"), k).as("h"))
    // both emit distinct hashes; fused keeps first-occurrence order, the
    // composed form too (array_distinct preserves order)
    assert(fused.orderBy("doc_id").collect().map(_.getSeq[Long](1)).toSeq ==
      composed.orderBy("doc_id").collect().map(_.getSeq[Long](1)).toSeq)
  }

  test("DBF sink → source round-trip preserves rows and types") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dbf_rt").toString
    val src = Seq(
      (1L, "alpha", 12.34, true),
      (2L, "beta column", -5.5, false),
      (3L, "", 0.0, true)
    ).toDF("K", "NAME", "PX", "FLAG").repartition(1)
    Dbf.write(src, Seq(
      Dbf.DbfField("K", 'N', 10, 0),
      Dbf.DbfField("NAME", 'C', 20, 0),
      Dbf.DbfField("PX", 'N', 12, 2),
      Dbf.DbfField("FLAG", 'L', 1, 0)), dir)
    val back = Dbf.read(spark, dir + "/*.dbf").orderBy("K").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      r.getBoolean(3))).toSeq ==
      Seq((1L, "alpha", 12.34, true), (2L, "beta column", -5.5, false),
        (3L, "", 0.0, true)))
  }
}
