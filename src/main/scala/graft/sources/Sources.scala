package graft.sources

import graft.schema.SdbSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-shaped input/output surfaces:
  *
  *  - S7 CSV source/sink (src/core/sis_csv.h:29-50): header-mapped
  *    typed CSV — Spark's csv source with an SdbSchema-derived schema.
  *  - S9 JSON / array-row ingest (`sis_json_to_struct_sds` /
  *    `sis_array_to_struct_sds`, src/core/sis_utils.h:47-50): a string
  *    column of `{field: val, ...}` objects or `[v1, v2, ...]`
  *    positional arrays → typed columns per the declared schema.
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, sdb: SdbSchema.Sdb,
      header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .schema(sdb.structType)
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  /** M1/S9 JSON-object rows: parse a `{field: val}` string column into
    * the schema's typed columns (`set key {json}`,
    * workers/sisdb/sisdb_io.c:209-237). */
  def fromJsonRows(df: DataFrame, jsonCol: String,
      sdb: SdbSchema.Sdb): DataFrame = {
    val parsed = df.withColumn("__row",
      from_json(col(jsonCol), sdb.structType))
    sdb.fields.foldLeft(parsed) { (d, f) =>
      d.withColumn(f.name, col(s"__row.${f.name}"))
    }.drop("__row")
  }

  /** S9 positional array rows: `[v1, v2, ...]` in declared field order.
    * Values parse as JSON strings then cast per field — the reference's
    * positional setter walks fields the same way
    * (sis_dynamic.h:477-535). */
  def fromArrayRows(df: DataFrame, arrCol: String,
      sdb: SdbSchema.Sdb): DataFrame = {
    val asArray = from_json(col(arrCol), ArrayType(StringType))
    val withVals = sdb.fields.zipWithIndex.foldLeft(
      df.withColumn("__vals", asArray)) { case (d, (f, i)) =>
      d.withColumn(f.name, element_at(col("__vals"), i + 1).cast(f.sparkType))
    }
    withVals.drop("__vals")
  }
}
