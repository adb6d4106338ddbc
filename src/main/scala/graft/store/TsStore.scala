package graft.store

import graft.ops.Write
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The reference's memory-first, disk-persistent table store
  * (workers/sisdb: in-memory hot series + per-day SDB files, daily
  * `save`, weekly `pack`) re-shaped for Spark:
  *
  *  - **cold**: parquet partitioned by a derived day column — pruned
  *    reads are Catalyst `PartitionFilters` (the engine's main scale
  *    lever, disk/readme.md types 4/6)
  *  - **hot**: the un-flushed tail held as eagerly-materialized
  *    (persisted) micro-batches (reference: the resident series,
  *    sisdb_fmap.h:57-61). The tail is BOUNDED: when the staged rows
  *    exceed `maxHotRows` or the staged batch count exceeds
  *    `maxHotBatches`, the store flushes itself — the Spark analogue of
  *    the reference's idle eviction / read-counter decay
  *    (sisdb_fmap.h:57-61: 36 h unread series are dropped from memory;
  *    here memory pressure, not wall-clock, is the budget that a
  *    1000-executor deployment actually cares about). The batch cap
  *    also bounds the union-plan depth, which would otherwise grow
  *    linearly in the number of `set` calls.
  *  - **read** = cold ∪ hot with last-write-wins dedupe by
  *    (subject, solely…, time) on the ingest sequence — the union the
  *    reference gets implicitly because memory shadows disk
  *    (SURVEY.md §7.5.5)
  *  - **save** flushes hot into ONLY the day partitions the tail
  *    touches (cmd `save`, sisdb.c:563-584 — the reference likewise
  *    rewrites dirty day files, not the whole store); **pack** rewrites
  *    partitions to bounded file counts (cmd `pack`, sisdb.c:586-602)
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
    val schema: Option[org.apache.spark.sql.types.StructType] = None,
    val maxHotRows: Long = 4L << 20,
    val maxHotBatches: Int = 64) {

  private var hotFrames: Vector[DataFrame] = Vector.empty
  private var hotRows: Long = 0L
  private var seq: Long = 0L

  /** Invoked after any operation that rewrites cold files (save /
    * replaceSubject / pack) — lets an owner holding external views of
    * the store (e.g. a registered SQL catalog table) refresh them.
    * The [[TsStore.ColdChange]] says *what* changed so the owner can
    * sync proportionally to the change (O(dirty days) for a save)
    * instead of re-listing every partition of a store holding years
    * of days on each hot-tail auto-flush. */
  @volatile private[graft] var onColdChange: TsStore.ColdChange => Unit = _ => ()

  private def hotUnion: Option[DataFrame] =
    hotFrames.reduceOption(_ unionByName _)

  private def clearHot(): Unit = {
    hotFrames.foreach(_.unpersist())
    hotFrames = Vector.empty
    hotRows = 0L
  }

  private def coldExists: Boolean =
    new java.io.File(path).exists()

  /** True when no row was ever written (no cold files, no hot tail) —
    * `del`/`drop` on such a store are benign no-ops, matching the
    * reference's no-data handling. */
  def isEmpty: Boolean = synchronized { hotFrames.isEmpty && !coldExists }

  /** Staged-but-unflushed row count — the quantity [[maxHotRows]]
    * bounds. */
  def hotSize: Long = synchronized(hotRows)

  def cold: Option[DataFrame] =
    if (coldExists) Some(spark.read.parquet(path)) else None

  /** M1/M3 `set`: stage rows into the hot tail (upsert semantics apply
    * at read/save time via the ingest sequence). The batch is persisted
    * and counted eagerly — reads must not recompute an arbitrary input
    * query, and the count feeds the flush threshold. Crossing either
    * bound triggers an automatic [[save]] (flush-on-threshold). */
  def set(rows: DataFrame): Unit = synchronized {
    seq += 1
    val stamped = rows
      .withColumn("__day", dayCol)
      .withColumn("__seq", lit(seq))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one pass counts the batch AND rejects null days: `save`'s
    // dirty-day matching is `isin(days)`, which (SQL null semantics)
    // can never select a NULL partition — a null-day row staged here
    // would clobber the cold __HIVE_DEFAULT_PARTITION__ dir without
    // merging it. The time/day column is the store's primary index;
    // a null there is a malformed row, refuse it at the door.
    val Array(total, nonNullDays) = stamped
      .select(count(lit(1)), count(col("__day")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    if (total != nonNullDays) {
      stamped.unpersist()
      seq -= 1
      throw new IllegalArgumentException(
        s"set: ${total - nonNullDays} row(s) have a null day/time index " +
          s"(store $path partitions by day; the main index must be non-null)")
    }
    hotRows += total
    hotFrames :+= stamped
    if (hotRows >= maxHotRows || hotFrames.size >= maxHotBatches) save()
  }

  /** The read view: cold ∪ hot, solely-upsert resolved last-seq-wins.
    * Day-filter BEFORE calling heavy ops so partition pruning fires on
    * the cold side. */
  def read(day: Option[String] = None): DataFrame = synchronized {
    val coldPart = cold.map(c => day.fold(c)(d => c.filter(col("__day") === d)))
    val hotPart = hotUnion.map(h => day.fold(h)(d => h.filter(col("__day") === d)))
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

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  /** Full-store rewrite through a temp dir + rename (Spark refuses to
    * overwrite a path its own plan reads). Used by the wholesale
    * operations; `save` takes the dirty-day incremental path. */
  private def writeCold(df: DataFrame): Unit = {
    val tmp = path.stripSuffix("/") + "__saving"
    df.withColumn("__seq", lit(0L))
      .repartition(col("__day"))
      .sortWithinPartitions(col(subject), col(time))
      .write.mode("overwrite").partitionBy("__day").parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(path)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
  }

  /** `save`: merge hot into the cold store and clear the tail —
    * incrementally. Only the day partitions the hot tail touches are
    * re-merged and swapped in (tmp write + per-day dir rename); a day
    * the tail never wrote is never read or rewritten. This is what
    * keeps `save` O(dirty days), not O(store) — at 100 TB the store
    * holds years of days and the tail touches one or two. */
  def save(): Unit = synchronized {
    hotUnion.foreach { h =>
      val dirtyDays = h.select(col("__day").cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
      val merged = cold match {
        case Some(c) =>
          Write.upsert(
            c.filter(col("__day").isin(dirtyDays: _*)).drop("__seq"),
            h, subject, soleCols :+ "__day", time, "__seq")
        case None =>
          Write.upsert(h.limit(0).drop("__seq"), h, subject,
            soleCols :+ "__day", time, "__seq")
      }
      val tmp = path.stripSuffix("/") + "__saving"
      merged.withColumn("__seq", lit(0L))
        .repartition(col("__day"))
        .sortWithinPartitions(col(subject), col(time))
        .write.mode("overwrite").partitionBy("__day").parquet(tmp)
      val f = fs
      f.mkdirs(new org.apache.hadoop.fs.Path(path))
      // swap in the day dirs the write ACTUALLY produced (their names
      // carry parquet's partition-value escaping — never hand-build
      // them from the raw day strings), and fail loudly on a rename
      // that didn't happen rather than dropping the merged output
      val dayDirs = f.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("__day="))
      require(dayDirs.length == dirtyDays.length,
        s"save produced ${dayDirs.length} day dirs for ${dirtyDays.length} dirty days")
      dayDirs.foreach { s =>
        val dest = new org.apache.hadoop.fs.Path(path, s.getPath.getName)
        f.delete(dest, true)
        if (!f.rename(s.getPath, dest))
          throw new java.io.IOException(s"could not commit day partition $dest")
      }
      f.delete(new org.apache.hadoop.fs.Path(tmp), true)
      clearHot()
      onColdChange(TsStore.DaysUpserted(dirtyDays))
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
    clearHot()
    onColdChange(TsStore.Rewritten)
  }

  /** `pack`: compaction to a bounded file count per partition. */
  def pack(targetFiles: Int): Unit = {
    Write.pack(spark, path, Seq("__day"), targetFiles)
    onColdChange(TsStore.Compacted)
  }
}

object TsStore {
  /** What a cold rewrite did — the contract behind [[TsStore.onColdChange]]. */
  sealed trait ColdChange
  /** `save`: exactly these day partitions were created or rewritten in
    * place; no partition was removed. A catalog owner needs only
    * `ADD IF NOT EXISTS PARTITION` per day + a file-index refresh. */
  final case class DaysUpserted(days: Seq[String]) extends ColdChange
  /** Wholesale rewrite (`del`/`drop`/replaceSubject): partitions may
    * have appeared or vanished — a full partition re-list is required. */
  case object Rewritten extends ColdChange
  /** `pack`: files rewritten inside existing partitions; the day set is
    * unchanged, only cached file listings are stale. */
  case object Compacted extends ColdChange
}
