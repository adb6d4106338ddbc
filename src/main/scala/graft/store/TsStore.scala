package graft.store

import graft.ops.Write
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's memory-first, disk-persistent table store
  * (workers/sisdb: in-memory hot series + per-day SDB files, daily
  * `save`, weekly `pack`) re-shaped for Spark:
  *
  *  - **cold**: parquet partitioned by a derived day column — pruned
  *    reads are Catalyst `PartitionFilters` (the engine's main scale
  *    lever, disk/readme.md types 4/6)
  *  - **hot**: the un-flushed tail held as an in-memory DataFrame
  *    (reference: the resident series, sisdb_fmap.h:57-61)
  *  - **read** = cold ∪ hot with last-write-wins dedupe by
  *    (subject, solely…, time) on the ingest sequence — the union the
  *    reference gets implicitly because memory shadows disk
  *    (SURVEY.md §7.5.5)
  *  - **save** flushes hot into the day partitions and clears it
  *    (cmd `save`, sisdb.c:563-584); **pack** rewrites partitions to
  *    bounded file counts (cmd `pack`, sisdb.c:586-602)
  *
  * Writes are serialized by the caller exactly like the reference's
  * single dispatcher thread (sisdb_server.c:474-476) — the store keeps
  * one writer's view consistent, it is not a concurrency layer.
  */
final class TsStore(
    val spark: SparkSession,
    val path: String,
    val subject: String,
    val time: String,
    val soleCols: Seq[String],
    val dayCol: org.apache.spark.sql.Column,
    val schema: Option[org.apache.spark.sql.types.StructType] = None) {

  private var hot: Option[DataFrame] = None
  private var seq: Long = 0L

  private def coldExists: Boolean =
    new java.io.File(path).exists()

  /** True when no row was ever written (no cold files, no hot tail) —
    * `del`/`drop` on such a store are benign no-ops, matching the
    * reference's no-data handling. */
  def isEmpty: Boolean = synchronized { hot.isEmpty && !coldExists }

  def cold: Option[DataFrame] =
    if (coldExists) Some(spark.read.parquet(path)) else None

  /** M1/M3 `set`: stage rows into the hot tail (upsert semantics apply
    * at read/save time via the ingest sequence). */
  def set(rows: DataFrame): Unit = synchronized {
    seq += 1
    val stamped = rows
      .withColumn("__day", dayCol)
      .withColumn("__seq", lit(seq))
    hot = Some(hot.fold(stamped)(_ unionByName stamped))
  }

  /** The read view: cold ∪ hot, solely-upsert resolved last-seq-wins.
    * Day-filter BEFORE calling heavy ops so partition pruning fires on
    * the cold side. */
  def read(day: Option[String] = None): DataFrame = synchronized {
    val coldPart = cold.map(c => day.fold(c)(d => c.filter(col("__day") === d)))
    val hotPart = hot.map(h => day.fold(h)(d => h.filter(col("__day") === d)))
    (coldPart, hotPart) match {
      case (Some(c), Some(h)) =>
        Write.upsert(c.drop("__seq"), h, subject, soleCols :+ "__day", time, "__seq")
      case (Some(c), None) => c.drop("__seq")
      case (None, Some(h)) =>
        Write.upsert(h.limit(0).drop("__seq"), h, subject,
          soleCols :+ "__day", time, "__seq")
      case (None, None) =>
        // created-but-never-written: the read view is an empty typed
        // DataFrame when the catalog schema is known (reference treats
        // no-data reads as benign), else still an error.
        schema match {
          case Some(st) =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
          case None =>
            throw new IllegalStateException(s"empty store at $path")
        }
    }
  }

  private def writeCold(df: DataFrame): Unit = {
    val tmp = path.stripSuffix("/") + "__saving"
    df.withColumn("__seq", lit(0L))
      .repartition(col("__day"))
      .sortWithinPartitions(col(subject), col(time))
      .write.mode("overwrite").partitionBy("__day").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
  }

  /** `save`: merge hot into the partitioned cold store, clear hot. */
  def save(): Unit = synchronized {
    hot.foreach { h =>
      val merged = cold match {
        case Some(c) =>
          Write.upsert(c.drop("__seq"), h, subject, soleCols :+ "__day",
            time, "__seq")
        case None =>
          Write.upsert(h.limit(0).drop("__seq"), h, subject,
            soleCols :+ "__day", time, "__seq")
      }
      writeCold(merged)
      hot = None
    }
  }

  /** M5/M6 support: replace one subject's rows wholesale (delete =
    * replace with the kept subset; drop = replace with nothing).
    * Flushes through the cold store like `save`. */
  def replaceSubject(subjectKey: Any, kept: DataFrame): Unit = synchronized {
    val others = read().filter(col(subject) =!= lit(subjectKey))
    val merged = others.unionByName(
      kept.select(others.columns.map(col): _*))
    writeCold(merged)
    hot = None
  }

  /** `pack`: compaction to a bounded file count per partition. */
  def pack(targetFiles: Int): Unit =
    Write.pack(spark, path, Seq("__day"), targetFiles)
}
