package graft.ops

import graft.schema.SdbSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dynamic version-tolerant schema convert (sis_dynamic.h:12-51,
  * converter built in sis_dynamic.c:392+): align a DataFrame written
  * under one schema version to another version of the same table.
  *
  * Rules, per the reference:
  *  - same field name + same style → carried over (numeric widening /
  *    narrowing is a cast; the reference memcpy/widen does the same,
  *    sis_dynamic.h:110-117)
  *  - same name but *different style* → "不同类型一律转为空或0": never
  *    cross-type coerce — numeric targets become 0, strings become "",
  *    never a best-effort cast (sis_dynamic.h:110-117)
  *  - target field absent from the source → 0/empty likewise
  *  - source-only fields are dropped
  */
object Convert {

  private def zeroOf(t: DataType) = t match {
    case StringType => lit("")
    case _: ArrayType => lit(Array.empty[Int]).cast(t)
    case other => lit(0).cast(other)
  }

  def align(df: DataFrame, from: SdbSchema.Sdb, to: SdbSchema.Sdb): DataFrame = {
    val fromByName = from.fields.map(f => f.name -> f).toMap
    val cols = to.fields.map { tf =>
      fromByName.get(tf.name) match {
        case Some(ff) if ff.style == tf.style =>
          col(tf.name).cast(tf.sparkType).as(tf.name)
        case _ => zeroOf(tf.sparkType).as(tf.name)
      }
    }
    df.select(cols: _*)
  }

  /** [[align]] with system/passthrough columns carried UNCHANGED after
    * the schema fields — the store-integration face: a cold read
    * aligning an old-era day dir to the live schema must keep the
    * store's own bookkeeping columns (subject, `__day`, `__seq`)
    * exactly as written, outside the never-cross-type rule. Columns in
    * `keep` that the frame does not have are skipped (the raw
    * snapshot-mode read carries `__seq`; some callers aligned a frame
    * that already dropped it). */
  def alignKeeping(df: DataFrame, from: SdbSchema.Sdb, to: SdbSchema.Sdb,
      keep: Seq[String]): DataFrame = {
    val fromByName = from.fields.map(f => f.name -> f).toMap
    val present = df.columns.toSet
    val cols = to.fields.map { tf =>
      fromByName.get(tf.name) match {
        case Some(ff) if ff.style == tf.style =>
          col(tf.name).cast(tf.sparkType).as(tf.name)
        case _ => zeroOf(tf.sparkType).as(tf.name)
      }
    } ++ keep.filter(present).map(col)
    df.select(cols: _*)
  }
}
