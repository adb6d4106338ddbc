package graft

import graft.ops.{Rollup, Sketches}
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance: partials are closed under merge,
  * batch slots replay idempotently, compaction is exact. */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  // (key, orderKey, value): bar "a" deliberately has its FIRST row in
  // the last batch and its LAST row in the first batch, so any
  // implementation that uses batch arrival order instead of the
  // carried order keys gets open/close wrong
  private val rows = Seq(
    ("a", 30L, 3.0), ("a", 40L, 4.0), // batch 0 (holds the close, 40)
    ("a", 20L, 9.0), ("b", 10L, 5.0), // batch 1
    ("a", 5L, 7.0), ("b", 20L, 1.0))  // batch 2 (holds the open, 5)
  private def batch(i: Int) = rows.slice(i * 2, i * 2 + 2)
    .toDF("key", "k", "v")
  private def all = rows.toDF("key", "k", "v")

  private def partials(df: org.apache.spark.sql.DataFrame) =
    Rollup.ohlcPartials(df, Seq(col("key")), col("k"), col("v"), col("v"))

  test("merged per-batch partials == one-shot ohlc, across batch order") {
    val merged = Rollup.finalizeBars(
      (0 to 2).map(i => partials(batch(i))).reduce(_ unionByName _),
      Seq("key"))
    val oneShot = Rollup.ohlc(all, Seq(col("key")), col("k"), col("v"),
      volume = Some(col("v")))
    val m = merged.collect().map(r => r.getString(0) -> r).toMap
    val o = oneShot.collect().map(r => r.getString(0) -> r).toMap
    assert(m.keySet == o.keySet)
    // a: open=7.0 (k=5, batch 2), close=4.0 (k=40, batch 0)
    assert(m("a").getDouble(m("a").fieldIndex("open")) == 7.0)
    assert(m("a").getDouble(m("a").fieldIndex("close")) == 4.0)
    m.keys.foreach { k =>
      Seq("open", "high", "low", "close", "cnt").foreach { f =>
        assert(m(k).get(m(k).fieldIndex(f)) == o(k).get(o(k).fieldIndex(f)),
          s"bar $k field $f")
      }
      assert(math.abs(m(k).getDouble(m(k).fieldIndex("volume")) -
        o(k).getDouble(o(k).fieldIndex("volume"))) < 1e-12)
    }
  }

  test("maintainDayPartials: inserts append, dirty days rebuild, others untouched") {
    val root = java.nio.file.Files
      .createTempDirectory("rollup_cdc").toString + "/bars"
    // three days, one group each
    val base = Seq(
      ("g", "d1", 10L, 1.0), ("g", "d1", 20L, 3.0),
      ("g", "d2", 10L, 5.0), ("g", "d3", 10L, 7.0))
      .toDF("key", "day", "k", "v")
    def maintain(ins: org.apache.spark.sql.DataFrame, dirty: Seq[String],
        state: org.apache.spark.sql.DataFrame, slot: Long) =
      Rollup.maintainDayPartials(ins, dirty, state, root, col("day"),
        Seq(col("key")), col("k"), col("v"), col("v"), slot)
    maintain(base, Seq.empty, base, 0L)
    def files(): Map[String, Set[String]] = {
      val f = new java.io.File(root)
      f.listFiles().filter(_.getName.startsWith("day=")).map { d =>
        def walk(x: java.io.File): Seq[String] =
          if (x.isDirectory) x.listFiles().toSeq.flatMap(walk)
          else Seq(x.getPath)
        d.getName.stripPrefix("day=") -> walk(d).toSet
      }.toMap
    }
    val before = files()
    assert(before.keySet == Set("d1", "d2", "d3"))
    // round 1: insert into d1 + a NEW day d4; d2 dirty (update to 6.0);
    // d3 dirty and fully deleted
    val ins = Seq(("g", "d1", 30L, 9.0), ("g", "d4", 10L, 2.0))
      .toDF("key", "day", "k", "v")
    val newState = Seq(
      ("g", "d1", 10L, 1.0), ("g", "d1", 20L, 3.0), ("g", "d1", 30L, 9.0),
      ("g", "d2", 10L, 6.0), ("g", "d4", 10L, 2.0))
      .toDF("key", "day", "k", "v")
    val (insDays, rebuilt) = maintain(ins, Seq("d2", "d3"), newState, 1L)
    assert(insDays == Seq("d1", "d4") && rebuilt == Seq("d2", "d3"))
    val after = files()
    assert(after("d1").intersect(before("d1")) == before("d1"),
      "insert-only day lost its existing slot files")
    assert(after("d1").exists(_.contains("batch=1")))
    assert(after.contains("d4"), "a brand-new day must appear")
    assert(after("d2").intersect(before("d2")).isEmpty,
      "dirty day kept stale files")
    assert(!after.contains("d3"), "a fully-deleted dirty day must vanish")
    // the maintained store equals the from-scratch rollup of newState
    val merged = Rollup.finalizeBars(
      spark.read.parquet(root)
        .withColumn("day", col("day").cast("string")).drop("batch"),
      Seq("key", "day")).orderBy("day")
      .select("day", "open", "high", "low", "close", "cnt", "volume")
      .collect().toSeq
    val fresh = Rollup.ohlc(newState, Seq(col("key"), col("day")),
      col("k"), col("v"), volume = Some(col("v"))).orderBy("day")
      .select("day", "open", "high", "low", "close", "cnt", "volume")
      .collect().toSeq
    assert(merged == fresh, s"maintained $merged != fresh $fresh")
    // replay: re-running the SAME round converges to the same store
    maintain(ins, Seq("d2", "d3"), newState, 1L)
    val replayed = Rollup.finalizeBars(
      spark.read.parquet(root)
        .withColumn("day", col("day").cast("string")).drop("batch"),
      Seq("key", "day")).orderBy("day")
      .select("day", "open", "high", "low", "close", "cnt", "volume")
      .collect().toSeq
    assert(replayed == fresh, "maintenance replay diverged")
  }

  test("slot replay is idempotent; compaction folds exactly and reads equal") {
    val root = java.nio.file.Files
      .createTempDirectory("rollup_spec").toString
    (0 to 2).foreach(i =>
      Sketches.appendBatch(partials(batch(i)), root, "ohlc", "t", i.toLong))
    val stored = s"$root/ohlc_t"
    val before = spark.read.parquet(stored)
      .orderBy("key", "batch").collect().toSeq
    Sketches.appendBatch(partials(batch(1)), root, "ohlc", "t", 1L)
    val replayed = spark.read.parquet(stored)
      .orderBy("key", "batch").collect().toSeq
    assert(replayed == before, "replayed slot changed the stored state")
    val preMerge = Rollup.finalizeBars(
      spark.read.parquet(stored).drop("batch"), Seq("key"))
      .orderBy("key").collect().toSeq
    assert(Rollup.compactBarPartialBatches(spark, root, "t", upTo = 1L,
      groupCols = Seq("key")) == 2)
    val slots = new java.io.File(stored).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    assert(slots == Seq("batch=1", "batch=2"), s"slots after compact: $slots")
    val postMerge = Rollup.finalizeBars(
      spark.read.parquet(stored).drop("batch"), Seq("key"))
      .orderBy("key").collect().toSeq
    assert(postMerge == preMerge, "compaction changed the merged bars")
  }

  test("compactMaintainedBars: hostile day keys fold under their escaped dirs; refuses a pending round") {
    val root = java.nio.file.Files
      .createTempDirectory("rollup_cmp").toString + "/bars"
    val hostile = "2024-01-03 10:30"
    val b0 = Seq(("g", hostile, 10L, 1.0), ("g", "plain", 10L, 2.0))
      .toDF("key", "day", "k", "v")
    val b1 = Seq(("g", hostile, 20L, 3.0)).toDF("key", "day", "k", "v")
    def maintain(ins: org.apache.spark.sql.DataFrame, slot: Long) =
      Rollup.maintainDayPartials(ins, Seq.empty, ins, root, col("day"),
        Seq(col("key")), col("k"), col("v"), col("v"), slot)
    maintain(b0, 0L)
    maintain(b1, 1L)
    def bars() = Rollup.finalizeBars(
      spark.read.parquet(root)
        .withColumn("day", col("day").cast("string")).drop("batch"),
      Seq("key", "day")).orderBy("day")
      .select("day", "open", "close", "cnt", "volume")
      .collect().map(_.toString).toSeq
    val before = bars()
    // a pending maintenance round blocks compaction outright
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_maint_round.json"),
      """{"slot":9,"dirtyDays":["d9"],"insertDays":[]}""".getBytes)
    val ex = intercept[IllegalStateException] {
      Rollup.compactMaintainedBars(spark, root, Seq("key"))
    }
    assert(ex.getMessage.contains("pending"), ex.getMessage)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$root/_maint_round.json"))
    // the hostile day (2 slots) folds; 'plain' (1 slot) is untouched
    assert(Rollup.compactMaintainedBars(spark, root, Seq("key"))
      == Seq(hostile))
    val dayDirs = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName).toSet
    assert(dayDirs.exists(_.contains("%")),
      s"the hostile day must live under its escaped dir: $dayDirs")
    val hostileSlots = new java.io.File(root).listFiles()
      .filter(d => d.getName.startsWith("day=") &&
        d.getName.contains("%"))
      .flatMap(_.listFiles()).map(_.getName).toSeq
    assert(hostileSlots == Seq("batch=0"), s"slots: $hostileSlots")
    assert(bars() == before, "compaction changed the merged bars")
    // nothing left to fold → no-op
    assert(Rollup.compactMaintainedBars(spark, root, Seq("key")).isEmpty)
  }

  test("maintainDayPartials: hostile day keys round-trip; an interrupted round is detectable") {
    val root = java.nio.file.Files
      .createTempDirectory("rollup_esc").toString + "/bars"
    // a day key Spark's writer must %-escape in the partition dir name:
    // pre-fix, raw-string path composition would mismatch the escaped
    // dir and land the rebuild under a wrong path
    val hostile = "2024-01-03 10:30"
    val base = Seq(("g", hostile, 10L, 1.0), ("g", hostile, 20L, 3.0),
      ("g", "plain", 10L, 2.0)).toDF("key", "day", "k", "v")
    def maintain(ins: org.apache.spark.sql.DataFrame, dirty: Seq[String],
        state: org.apache.spark.sql.DataFrame, slot: Long) =
      Rollup.maintainDayPartials(ins, dirty, state, root, col("day"),
        Seq(col("key")), col("k"), col("v"), col("v"), slot)
    maintain(base, Seq.empty, base, 0L)
    assert(Rollup.pendingMaintenance(spark, root).isEmpty,
      "a completed round must leave no marker")
    // dirty rebuild of the hostile day: the new state re-values it
    val newState = Seq(("g", hostile, 10L, 5.0), ("g", "plain", 10L, 2.0))
      .toDF("key", "day", "k", "v")
    val (_, rb) = maintain(base.limit(0), Seq(hostile), newState, 1L)
    assert(rb == Seq(hostile))
    val bars = Rollup.finalizeBars(
      spark.read.parquet(root)
        .withColumn("day", col("day").cast("string")).drop("batch"),
      Seq("key", "day"))
    val got = bars.filter(col("day") === hostile).select("open", "cnt")
      .collect().toSeq.map(r => (r.getDouble(0), r.getLong(1)))
    assert(got == Seq((5.0, 1L)),
      s"hostile day did not rebuild under its escaped dir: $got")
    // fully-deleted hostile day: the delete path must compose the
    // SAME escaped name the writer produced, or the dir survives
    val finalState = Seq(("g", "plain", 10L, 2.0)).toDF("key", "day", "k", "v")
    maintain(base.limit(0), Seq(hostile), finalState, 2L)
    val days = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName).toSet
    assert(days.size == 1 && days.head.contains("plain"),
      s"fully-deleted hostile day dir survived: $days")
    assert(Rollup.pendingMaintenance(spark, root).isEmpty)
    // a crashed round leaves its marker for the detector (hand-write
    // the artifact a crash mid-placement would leave behind; a marker
    // without insertDays — the pre-r17 shape — reads as empty)
    val mk = new java.io.File(s"$root/_maint_round.json")
    java.nio.file.Files.write(mk.toPath,
      """{"slot":7,"dirtyDays":["d9"]}""".getBytes)
    assert(Rollup.pendingMaintenance(spark, root)
      .contains((7L, Seq("d9"), Seq.empty)),
      "an interrupted round was not detected")
    // a DIFFERENT round that does not subsume the crashed round's
    // days must refuse to run: completing it would clear the marker
    // and mask the crashed round's possibly-missing day
    val ex = intercept[IllegalArgumentException] {
      maintain(base.limit(0), Seq.empty, finalState, 3L)
    }
    assert(ex.getMessage.contains("slot 7"), ex.getMessage)
    assert(Rollup.pendingMaintenance(spark, root)
      .contains((7L, Seq("d9"), Seq.empty)))
    // releasing under the WRONG slot is refused too
    intercept[IllegalArgumentException] {
      Rollup.releaseMaintMarker(spark, root, 3L)
    }
    // re-running THE crashed round (same slot) converges and clears
    maintain(base.limit(0), Seq("d9"), finalState, 7L)
    assert(Rollup.pendingMaintenance(spark, root).isEmpty,
      "re-running the crashed round did not clear its marker")
    // a round that SUBSUMES the crashed round's recorded days (dirty
    // AND insert) may run under a different slot: those days rebuild
    // wholesale from state, so the dead slot's partial placements —
    // including ones its feed would never re-derive — cannot survive
    java.nio.file.Files.write(mk.toPath,
      """{"slot":9,"dirtyDays":["d9"],"insertDays":["plain"]}"""
        .getBytes)
    assert(Rollup.pendingMaintenance(spark, root)
      .contains((9L, Seq("d9"), Seq("plain"))))
    maintain(base.limit(0), Seq("d9", "plain"), finalState, 10L)
    assert(Rollup.pendingMaintenance(spark, root).isEmpty,
      "a subsuming round did not clear the crashed round's marker")
    val survivors = Rollup.finalizeBars(
      spark.read.parquet(root)
        .withColumn("day", col("day").cast("string")).drop("batch"),
      Seq("key", "day")).select("day", "open", "cnt")
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1),
        r.getLong(2)))
    assert(survivors == Seq(("plain", 2.0, 1L)),
      s"the subsuming rebuild did not re-derive from state: $survivors")
  }
}
