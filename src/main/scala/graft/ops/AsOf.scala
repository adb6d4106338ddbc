package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of ("ifprev") join — the reference's prev-row fallback semantics
  * generalized into a real join operator.
  *
  * Reference: when a timestamp has no exact row, sisdb serves the last
  * earlier row (workers/sisdb/sisdb_fmap.h:109-137, CMP_FIND_AGO in
  * sisdb_fmap_ctrl.c:619-640). The reference only does this per-key on a
  * single series; here it is a distributed join between a probe side and
  * a quote side.
  *
  * Implementation note (scale): the naive formulation is an inequality
  * join (`l.t >= r.t`) which Spark plans as BroadcastNestedLoop /
  * cartesian — O(n*m), unusable at 100 TB. Instead we use the union
  * trick: tag both sides, union, and take a running `last(right-col,
  * ignoreNulls)` over a window partitioned by the join key and ordered
  * by time. That is ONE shuffle on the key (same cost as a regular
  * sort-merge join) and no row explosion, so it scales linearly.
  */
object AsOf {

  /** For every left row, attach the latest right row whose
    * `rightTime` <= left's `leftTime`, matching on `keys`.
    *
    * @param rightVals right-side value columns to carry (joined output
    *                  columns keep these names; left columns all kept)
    * @param strict    if true use `<` instead of `<=`
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // normalize both sides to: keys..., __t, __isLeft, left-cols..., rightVals...
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__isLeft", lit(1))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__isLeft")) ++
          leftCols.filterNot(keys.contains).map(col) ++
          rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__isLeft", lit(0))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__isLeft")) ++
          leftCols.filterNot(keys.contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightVals.map(col): _*)
    // Order: time asc, then right rows BEFORE left rows at equal time when
    // inclusive (<=), AFTER when strict (<) — so the running last() sees
    // exactly the admissible right rows.
    val sideOrder = if (strict) col("__isLeft").desc else col("__isLeft").asc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__isLeft") === 1)
      .drop("__t", "__isLeft")
  }
}
