package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.catalog.Catalog
import graft.fmt.Render
import graft.ops.{Query, Write}
import graft.schema.SdbSchema
import graft.sources.Sources
import graft.store.TsStore
import graft.stream.SubRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's command surface end-to-end: `create/set/get/keys/
  * del/drop/save/pack/sub` against `subject.table` keys
  * (workers/sisdb/sisdb.h:44-53, command table sisdb.c:14-42), wired
  * over the engine's primitives — SdbSchema for table declarations,
  * TsStore per table for storage, Query for the range/where/fields
  * matrix (sisdb_io.c:23-93), Render for the j/a/c output formats, and
  * SubRegistry for live pub/sub on writes.
  *
  * A reference client's
  * `get SH600600.stk_day {"range":{"start":20210101,"stop":20211231},
  * "fields":"time,open,close","format":"a"}` becomes
  * `engine.get("SH600600.stk_day", params)` with identical semantics.
  */
final class Engine(val spark: SparkSession, rootPath: String) {

  val catalog = new Catalog
  val subs = new SubRegistry
  private val stores = scala.collection.concurrent.TrieMap[String, TsStore]()
  // every SQL-exposed qualified name per table — exposeSql may run more
  // than once (e.g. into different databases) and ALL registrations
  // must stay live, so the store's single callback fans out over this
  // list rather than being replaced per call
  private val sqlNames = scala.collection.concurrent.TrieMap[String, Vector[String]]()
  private val mapper = new ObjectMapper()

  /** `create`: declare a table from the schema DSL. */
  def create(dsl: String): SdbSchema.Sdb = {
    val sdb = catalog.register(dsl)
    sdb
  }

  private def storeOf(table: String): TsStore = {
    val sdb = catalog.get(table).getOrElse(
      throw new IllegalArgumentException(s"unknown table '$table'"))
    val timeField = sdb.mainIndex.map(_.name).getOrElse(
      throw new IllegalArgumentException(s"table '$table' has no main index"))
    stores.getOrElseUpdate(table, new TsStore(
      spark, s"$rootPath/$table", subject = "subject", time = timeField,
      soleCols = sdb.solelyFields.map(_.name),
      dayCol = Engine.dayOf(sdb, timeField),
      schema = Some(org.apache.spark.sql.types.StructType(
        sdb.structType.fields :+
          org.apache.spark.sql.types.StructField("subject",
            org.apache.spark.sql.types.StringType) :+
          org.apache.spark.sql.types.StructField("__day",
            org.apache.spark.sql.types.StringType)))))
  }

  private def splitKey(key: String): (String, String) = {
    val i = key.lastIndexOf('.')
    require(i > 0, s"key '$key' is not subject.table")
    (key.substring(0, i), key.substring(i + 1))
  }

  /** `set subject.table {json row or [rows]}`: typed parse per the
    * declared schema → staged into the hot tail → published to
    * matching subscribers (the reference publishes on every set,
    * sisdb.c:279). */
  def set(key: String, json: String): Long = {
    val (subject, table) = splitKey(key)
    val sdb = catalog.get(table).getOrElse(
      throw new IllegalArgumentException(s"unknown table '$table'"))
    val node = mapper.readTree(json)
    val rows: Seq[String] =
      if (node.isArray && node.size() > 0 && node.get(0).isArray)
        (0 until node.size()).map(i => node.get(i).toString)
      else if (node.isArray)
        (0 until node.size()).map(i => node.get(i).toString)
      else Seq(node.toString)
    import spark.implicits._
    val raw = rows.toDF("__json")
    val typed =
      (if (json.trim.startsWith("[[") ||
        (node.isArray && node.size() > 0 && node.get(0).isArray))
        Sources.fromArrayRows(raw, "__json", sdb)
      else Sources.fromJsonRows(raw, "__json", sdb))
        .drop("__json")
        .withColumn("subject", lit(subject))
    storeOf(table).set(typed)
    subs.publish(typed, "subject", table)
    rows.size.toLong
  }

  /** `get subject.table {range|where, fields, count, format}` —
    * the full parameter matrix of sisdb_io.c:23-93. Returns the
    * DataFrame (format=s) or a rendered payload column (j/a/c).
    *
    * The table side may be a comma list (`get SH600600.stk_snapshot,
    * stk_trancat`, sisdb.h:44-49): the reply is then the union of each
    * table's RENDERED payload rows tagged with a `table` column —
    * table schemas differ, so a multi-table get requires a rendered
    * format (defaults to `j` when unspecified) and rejects `s`. */
  def get(key: String, paramsJson: String = "{}"): DataFrame = {
    val (subject, tablePart) = splitKey(key)
    val tables = tablePart.split(",").map(_.trim).filter(_.nonEmpty)
    require(tables.nonEmpty, s"key '$key' names no table")
    if (tables.length == 1) getOne(subject, tables.head, paramsJson)
    else {
      val p0 = mapper.readTree(SdbSchema.quoteBareWords(paramsJson))
      val fmt = if (p0.has("format")) p0.get("format").asText("j") else "j"
      require(fmt != "s",
        "multi-table get returns rendered payloads — use format j/a/c")
      require(p0.isObject, s"get params must be a JSON object, got: $paramsJson")
      val withFmt =
        if (p0.has("format")) paramsJson
        else {
          val n = p0.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          n.put("format", "j"); n.toString
        }
      tables.map(t => getOne(subject, t, withFmt)
          .select(col("subject"), lit(t).as("table"), col("payload")))
        .reduce(_ unionByName _)
    }
  }

  private def getOne(subject: String, table: String,
      paramsJson: String): DataFrame = {
    val sdb = catalog.get(table).get
    val timeField = sdb.mainIndex.map(_.name).get
    val p = mapper.readTree(SdbSchema.quoteBareWords(paramsJson))
    // full sis_match_key vocabulary incl. comma lists
    // (`get SH600600,SH600601.stk_day …`, sisdb.h:44-49)
    val base = storeOf(table).read()
      .filter(graft.store.KvStore.matchCond("subject", subject))

    val toLong: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => Engine.indexAsLong(sdb, timeField, c)

    val afterMatch =
      if (p.has("range")) {
        val r = p.get("range")
        val start = if (r.has("start")) r.get("start").asLong(-1L) else -1L
        val stop = if (r.has("stop")) r.get("stop").asLong(0L) else 0L
        val ifprev = r.has("ifprev") && r.get("ifprev").asInt(0) == 1
        Query.range(base, "subject", timeField, start, stop, ifprev,
          toLong = toLong)
      } else if (p.has("where")) {
        val w = p.get("where")
        Query.whereOffset(base, "subject", timeField,
          if (w.has("start")) w.get("start").asLong(0L) else 0L,
          if (w.has("offset")) w.get("offset").asInt(0) else 0,
          toLong = toLong)
      } else base

    val afterCount =
      if (p.has("count") && p.get("count").asInt(0) != 0)
        Query.limitPerSubject(afterMatch, "subject", timeField,
          p.get("count").asInt(0))
      else afterMatch

    val fieldNames: Seq[String] =
      if (p.has("fields") && p.get("fields").asText() != "*")
        p.get("fields").asText().split(",").map(_.trim).toSeq
      else sdb.fields.map(_.name)
    val projected = afterCount.select(
      (col("subject") +: fieldNames.map(col)): _*)

    val fmt =
      if (p.has("format")) p.get("format").asText("s").headOption.getOrElse('s')
      else 's'
    fmt match {
      case 's' => projected
      // render fields in REQUEST order (the reference renders array
      // payloads in the order the client asked for, not schema order)
      case code => Render.format(projected, code,
        SdbSchema.Sdb(sdb.name,
          fieldNames.flatMap(n => sdb.fields.find(_.name == n))))
    }
  }

  /** `keys pattern.table`: matching subjects. */
  def keys(pattern: String): DataFrame = {
    val (subject, table) = splitKey(pattern)
    graft.store.KvStore.keys(storeOf(table).read(), "subject", subject)
  }

  /** `del subject.table {range:{start, stop}}`: anti-filter rewrite,
    * staged as a full replace of that subject's rows. */
  def del(key: String, paramsJson: String): Unit = {
    val (subject, table) = splitKey(key)
    val sdb = catalog.get(table).get
    val timeField = sdb.mainIndex.map(_.name).get
    val p = mapper.readTree(SdbSchema.quoteBareWords(paramsJson))
    val r = p.get("range")
    val st = storeOf(table)
    if (st.isEmpty) return // benign no-data case, like the reference
    val kept = Write.deleteRange(
      st.read().filter(col("subject") === subject),
      Engine.indexAsLong(sdb, timeField, col(timeField)),
      if (r != null && r.has("start")) r.get("start").asLong(0L) else 0L,
      if (r != null && r.has("stop")) r.get("stop").asLong(0L) else 0L)
    st.replaceSubject(subject, kept)
  }

  /** `drop subject.table`. */
  def drop(key: String): Unit = {
    val (subject, table) = splitKey(key)
    val st = storeOf(table)
    if (st.isEmpty) return // benign no-data case, like the reference
    st.replaceSubject(subject, st.read().filter(lit(false)))
  }

  def save(table: String): Unit = storeOf(table).save()
  def pack(table: String, files: Int = 4): Unit = storeOf(table).pack(files)

  /** U1 SQL front door: flush a table's hot tail and register its
    * partitioned store in the session catalog as external parquet
    * `<db>.<table>`, so plain `spark.sql` clients query the engine
    * without the Scala API — Spark's catalog is the analogue of the
    * reference's command front door (workers/sisdb/sisdb.c:14-42).
    * `__day` stays a partition column, so SQL day predicates prune
    * exactly like the Scala read path. Returns the qualified name.
    *
    * The registration is kept LIVE, not a one-shot snapshot: every
    * later cold rewrite (`save`, `del`/`drop`, `pack` — including the
    * hot tail's auto-flush) re-syncs the catalog partitions and drops
    * Spark's cached file index, so SQL clients see exactly what the
    * Scala read path sees. (Hot rows staged since the last save are
    * visible only to the Scala path by design — `save` is the
    * publish point, like the reference's disk flush.)
    *
    * The sync cost is proportional to the CHANGE, preserving `save`'s
    * O(dirty days) property: a save adds exactly its dirty-day
    * partitions (`ALTER TABLE … ADD IF NOT EXISTS PARTITION`), a pack
    * only drops cached file listings, and only a wholesale rewrite
    * (`del`/`drop`) — which may remove partitions — pays the full
    * `MSCK … SYNC PARTITIONS` re-list. Calling exposeSql again (same
    * or another db) keeps every earlier registration live. */
  def exposeSql(table: String, db: String = "graft"): String = {
    val st = storeOf(table)
    st.save()
    val qn = s"$db.$table"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $qn")
    spark.catalog.createTable(qn, "parquet", Map("path" -> st.path))
    spark.catalog.recoverPartitions(qn)
    sqlNames.updateWith(table)(prev =>
      Some(prev.getOrElse(Vector.empty).filterNot(_ == qn) :+ qn))
    st.onColdChange = change => sqlNames.getOrElse(table, Vector.empty)
      .foreach { name =>
        change match {
          case TsStore.DaysUpserted(days) =>
            // save never removes a day — targeted ADDs, no full re-list
            days.foreach { d =>
              val v = d.replace("'", "''")
              spark.sql(
                s"ALTER TABLE $name ADD IF NOT EXISTS PARTITION (__day='$v')")
            }
          case TsStore.Rewritten =>
            spark.sql(s"MSCK REPAIR TABLE $name SYNC PARTITIONS")
          case TsStore.Compacted => // day set unchanged; refresh below
        }
        // drop the cached file index in every case — in-place day dir
        // renames and compactions would otherwise serve stale listings
        spark.catalog.refreshTable(name)
      }
    qn
  }

  /** `sub pattern` (T1): live fan-out of future `set`s. */
  def sub(id: String, patterns: Seq[String])(cb: DataFrame => Unit): Unit =
    subs.subscribe(id, patterns)(cb)
  def unsub(id: String): Unit = subs.unsubscribe(id)
}

object Engine {
  /** Day partition derivation per the schema's main-index style: date
    * int and year stay as-is (the reference stores day-scale series
    * per year, finer series per day, workers/sisdb/sisdb.h:36-42). */
  private[api] def dayOf(sdb: SdbSchema.Sdb, timeField: String) = {
    val f = sdb.fields.find(_.name == timeField).get
    f.style match {
      case 'D' => col(timeField).cast("string")
      case 'T' | 'S' | 'W' => date_format(col(timeField), "yyyy-MM-dd")
      case _ => col(timeField).cast("string")
    }
  }

  /** The main index compared as a long per its declared style: date
    * ints compare as yyyymmdd, timestamps as epoch ms — matching the
    * reference's numeric range params. */
  private[api] def indexAsLong(sdb: SdbSchema.Sdb, timeField: String,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val f = sdb.fields.find(_.name == timeField).get
    f.style match {
      case 'D' => (year(c) * 10000 + month(c) * 100 + dayofmonth(c)).cast("long")
      case 'T' | 'S' | 'W' => unix_millis(c)
      case _ => c.cast("long")
    }
  }
}
