package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match each left-side interval `[lo, hi)`
  * with every right-side point `point ∈ [lo, hi)`.
  *
  * Spark's planner turns a bare `point >= lo && point < hi` join into
  * BroadcastNestedLoopJoin (small side) or a cartesian product — both
  * O(|L|·|R|) and fatal at 100 TB. The scalable shape is the classic
  * bin-bucketing rewrite (what Databricks' range-join hints and
  * KDB-style temporal joins do): quantize time into `binWidth`-sized
  * bins, explode each interval to the bins it overlaps, key each point
  * by its bin, equi-join on the bin id, then re-apply the exact range
  * predicate. The join becomes a plain shuffled hash/sort-merge join
  * whose cost is O(|L|·spanBins + |R|) shuffle plus only the
  * within-bin pair comparisons.
  *
  * Each (interval, point) match is found exactly once — a point lives
  * in exactly one bin — so no post-join dedup is needed.
  *
  * `binWidth` is the scale dial: it should be on the order of the
  * TYPICAL interval span, so each interval explodes to ~2 bins and a
  * bin holds ~|R|·binWidth/timespan points. Too small → interval
  * explosion; too large → bins degenerate toward the cartesian worst
  * case. Reference behavior: the reference serves range reads via its
  * per-day file blocking (src/core/disk/readme.md SIS_DISK_TYPE_SDB_DATE
  * — day-quantized blocks searched by key+time); this operator is the
  * join-shaped generalization of that quantization.
  */
object RangeJoin {

  /** Join `left` intervals `[lo, hi)` (any long scale) with `right`
    * points. Returns all columns of both sides, one row per
    * (interval, point) match. Column sets must be disjoint.
    *
    * `TimestampType` endpoints/points are converted to epoch
    * MILLISECONDS (a bare `cast("long")` would truncate to whole
    * seconds); plain numeric columns are compared as longs unchanged.
    * Mixing a timestamp side with a raw-long side is the caller's
    * responsibility — both sides must be on the same scale.
    *
    * Empty and inverted intervals (`hi <= lo`) match nothing under
    * `[lo, hi)` semantics and are dropped BEFORE the bin explode — an
    * inverted interval would otherwise make `sequence(start, stop)`
    * generate a DESCENDING bin list (Spark defaults the step to -1
    * when start > stop), turning one corrupt epoch-ms row into
    * billions of exploded bins. */
  def binned(left: DataFrame, lo: Column, hi: Column,
      right: DataFrame, point: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left/right share column(s) ${clash.mkString(", ")} — alias them apart")
    val reserved = Seq("__bin", "__lo", "__hi", "__himl", "__pt")
      .filter((left.columns ++ right.columns).contains)
    require(reserved.isEmpty,
      s"input already has internal column(s) ${reserved.mkString(", ")}")
    // Floor-div in LONG space: subtract pmod (≥0) so the numerator is
    // an exact multiple, then integral `div`. Never `/` — Spark's `/`
    // is double division, exact only to 2^53, and `div` alone
    // truncates toward zero on negative epochs instead of flooring.
    def binOf(name: String): String =
      s"($name - pmod($name, ${binWidth}L)) div ${binWidth}L"
    val l = asLong(asLong(left, lo, "__lo"), hi, "__hi")
      .where(col("__hi") > col("__lo"))
      .withColumn("__himl", col("__hi") - 1)
      .withColumn("__bin",
        explode(sequence(expr(binOf("__lo")), expr(binOf("__himl")))))
      .drop("__himl")
    val r = asLong(right, point, "__pt")
      .withColumn("__bin", expr(binOf("__pt")))
    l.join(r, l("__bin") === r("__bin") &&
        col("__pt") >= col("__lo") && col("__pt") < col("__hi"))
      .drop("__bin", "__lo", "__hi", "__pt")
  }

  /** Interval × interval OVERLAP join: `[loL, hiL)` overlaps
    * `[loR, hiR)` iff `loL < hiR && loR < hiL`. Same bin-bucketing
    * rewrite as [[binned]], with the exactly-once rule generalized:
    * two overlapping intervals share every bin their intersection
    * touches, so a pair is emitted only from the bin containing the
    * overlap's START (`greatest(loL, loR)`) — a bin both sides
    * necessarily explode to. No post-join dedup. Empty/inverted
    * intervals on either side are dropped before the explode. */
  def overlap(left: DataFrame, loL: Column, hiL: Column,
      right: DataFrame, loR: Column, hiR: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left/right share column(s) ${clash.mkString(", ")} — alias them apart")
    val reserved = Seq("__bin", "__rbin", "__llo", "__lhi", "__rlo", "__rhi", "__himl")
      .filter((left.columns ++ right.columns).contains)
    require(reserved.isEmpty,
      s"input already has internal column(s) ${reserved.mkString(", ")}")
    def binOf(name: String): String =
      s"($name - pmod($name, ${binWidth}L)) div ${binWidth}L"
    def explodeBins(df: DataFrame, lo: Column, hi: Column,
        loName: String, hiName: String, binName: String): DataFrame =
      asLong(asLong(df, lo, loName), hi, hiName)
        .where(col(hiName) > col(loName))
        .withColumn("__himl", col(hiName) - 1)
        .withColumn(binName,
          explode(sequence(expr(binOf(loName)), expr(binOf("__himl")))))
        .drop("__himl")
    val l = explodeBins(left, loL, hiL, "__llo", "__lhi", "__bin")
    val r = explodeBins(right, loR, hiR, "__rlo", "__rhi", "__rbin")
    l.join(r, col("__bin") === col("__rbin") &&
        col("__llo") < col("__rhi") && col("__rlo") < col("__lhi") &&
        col("__bin") === expr(binOf("greatest(__llo, __rlo)")))
      .drop("__bin", "__rbin", "__llo", "__lhi", "__rlo", "__rhi")
  }

  /** Attach `c` as long column `name`: epoch-ms for timestamps
    * (sub-second precision preserved), plain long cast otherwise. */
  private def asLong(df: DataFrame, c: Column, name: String): DataFrame = {
    val tagged = df.withColumn(name, c)
    tagged.schema(name).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        tagged.withColumn(name, unix_millis(col(name)))
      case _ => tagged.withColumn(name, col(name).cast("long"))
    }
  }
}
