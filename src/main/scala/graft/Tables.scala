package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders over the driver-generated parquet dirs
  * (TESTDATA.md). Every query receives `sfDir` and reads through here so
  * scans stay plain parquet sources — Catalyst pushes filters/projection
  * down to the file scan (SURVEY.md §4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session config every entry point needs before reading the test
    * parquet:
    *  - `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    *    reader rejects; `nanosAsLong` reads it as a long we re-wrap below.
    *  - `lineitem.l_shipdate` is TIMESTAMP_MILLIS without tz metadata;
    *    with NTZ inference off (and a UTC session) it loads as a plain
    *    TIMESTAMP so `unix_millis` & friends apply.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // ts arrives as long nanos (see configure); truncate to Spark's
      // native µs precision. Downstream comparisons are all >= ms
      // granularity, matching the oracle's ns-precision reads. A
      // replicated/derived events table (graft.SfScale) has already
      // been through this wrapping and loads as a plain TIMESTAMP.
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
