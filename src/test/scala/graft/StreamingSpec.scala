package graft

import graft.stream.{Ingest, Replay, SubRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** T1-T4 slice: file-source streaming ingest into the partitioned
  * store, live pub/sub fan-out with prefix matching, ordered replay,
  * and partition pruning on the read path. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("subject", StringType), StructField("t", LongType),
    StructField("v", DoubleType)))

  test("ingest → store → pub/sub → replay, end to end") {
    val root = Files.createTempDirectory("graft_stream").toString
    val src = s"$root/src"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    // batch 1 lands before the stream starts; AvailableNow drains it
    Seq(("SH600600", 1000L, 1.0), ("SH600601", 2000L, 2.0),
        ("SZ000001", 1500L, 3.0))
      .toDF("subject", "t", "v").coalesce(1).write.parquet(s"$src/b1")
    Seq(("SH600600", 3000L, 4.0), ("SZ000001", 2500L, 5.0))
      .toDF("subject", "t", "v").coalesce(1).write.parquet(s"$src/b2")

    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val all = new java.util.concurrent.atomic.AtomicLong(0)
    val subs = new SubRegistry
    subs.subscribe("c1", Seq("SH6*"))(df => seen.addAndGet(df.count()))
    subs.subscribe("c2", Seq("*"))(df => all.addAndGet(df.count()))

    val q = Ingest.start(spark, s"$src/*", schema, store, ckpt,
      subjectCol = "subject", timeCol = "t",
      dayCol = lit("2024-01-01"), subs = subs)
    q.awaitTermination(60000)

    // store holds every row, day-partitioned
    val stored = Ingest.read(spark, store)
    assert(stored.count() == 5)
    // prefix subscriber saw only SH6*; wildcard saw everything
    assert(seen.get() == 3, s"prefix subscriber saw ${seen.get()}")
    assert(all.get() == 5)
    // pruned read: day filter must reach PartitionFilters
    val pruned = Ingest.read(spark, store, day = Some("2024-01-01"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__day"),
      s"day filter not pushed to partition pruning:\n$plan")
    // replay: full day in (t, seq) order
    val replayed = scala.collection.mutable.ArrayBuffer[Long]()
    val n = Replay.replayDay(spark, store, "2024-01-01", "t",
      seqCol = Some("__ingest_seq"))(
      onRow = r => replayed += r.getAs[Long]("t"), onStart = (), onStop = ())
    assert(n == 5)
    assert(replayed.toSeq == replayed.toSeq.sorted, s"out of order: $replayed")
  }

  test("late second batch: restart drains only new files (checkpoint WAL)") {
    val root = Files.createTempDirectory("graft_stream2").toString
    val src = s"$root/src"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()
    Seq(("A", 1L, 1.0)).toDF("subject", "t", "v")
      .coalesce(1).write.parquet(s"$src/b1")
    val q1 = Ingest.start(spark, s"$src/*", schema, store, ckpt,
      "subject", "t", lit("d1"))
    q1.awaitTermination(60000)
    assert(Ingest.read(spark, store).count() == 1)
    // new file arrives; a restarted stream picks up ONLY it
    Seq(("B", 2L, 2.0)).toDF("subject", "t", "v")
      .coalesce(1).write.parquet(s"$src/b2")
    val q2 = Ingest.start(spark, s"$src/*", schema, store, ckpt,
      "subject", "t", lit("d1"))
    q2.awaitTermination(60000)
    val subjects = Ingest.read(spark, store).select("subject")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(subjects == Seq("A", "B"), s"got $subjects")
  }
}
