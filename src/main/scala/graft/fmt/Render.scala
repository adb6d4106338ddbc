package graft.fmt

import graft.schema.SdbSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S10 output formatters: rows → JSON object / array-of-values / CSV
  * line, with optional field projection and `dot` price formatting —
  * the reference's client-facing render surface
  * (sis_sdb_fields_to_{json,array,csv}_sds, src/core/sis_utils.h:26-44;
  * format switch workers/sisdb/sisdb_io.c:144-178; format codes
  * z/s/b/j/a/c in sis_db.c).
  *
  * Everything renders as native column expressions (`to_json`,
  * `concat_ws`, decimal casts) so formatting runs distributed at scan
  * speed and the result stays a DataFrame — a driver that needs the
  * reference's single-payload reply concatenates per partition.
  */
object Render {

  /** Price rendering honoring the declared `dot` (decimal places):
    * fixed-point string exactly like the reference's P-type output
    * (sis_dynamic.h:419-424 renders price as double with dot digits). */
  def price(c: Column, dot: Int): Column =
    c.cast(DecimalType(38, dot)).cast("string")

  private def rendered(df: DataFrame, fields: Seq[String],
      dots: Map[String, Int]): Seq[Column] =
    fields.map { f =>
      dots.get(f) match {
        case Some(d) => price(col(f), d).as(f)
        case None => col(f)
      }
    }

  /** format=j: one JSON object string per row (projected fields). */
  def toJsonRows(df: DataFrame, fields: Seq[String],
      dots: Map[String, Int] = Map.empty, out: String = "json"): DataFrame =
    df.withColumn(out, to_json(struct(rendered(df, fields, dots): _*)))

  /** format=a: one JSON array-of-values string per row — the
    * reference's default wire format (sisdb_io.c:162-177). */
  def toArrayRows(df: DataFrame, fields: Seq[String],
      dots: Map[String, Int] = Map.empty, out: String = "arr"): DataFrame = {
    // render each value via to_json(array(x)) = "[v]" (JSON quoting and
    // escaping for free) then strip the brackets
    val parts = rendered(df, fields, dots)
      .map(c => regexp_replace(to_json(array(c)), "^\\[|\\]$", ""))
    df.withColumn(out, concat(lit("["), concat_ws(",", parts: _*), lit("]")))
  }

  /** format=c: CSV line per row (no quoting for the reference's simple
    * numeric/char payloads; strings with separators get quoted). */
  def toCsvRows(df: DataFrame, fields: Seq[String],
      dots: Map[String, Int] = Map.empty, out: String = "csv"): DataFrame = {
    val parts = rendered(df, fields, dots).map { c =>
      when(c.cast("string").contains(","),
        concat(lit("\""), c.cast("string"), lit("\"")))
        .otherwise(c.cast("string"))
    }
    df.withColumn(out, concat_ws(",", parts: _*))
  }

  /** Render with a schema's declared dots: every P field uses its own
    * `dot`. */
  def withSchemaDots(sdb: SdbSchema.Sdb): Map[String, Int] =
    sdb.fields.filter(_.style == 'P').map(f => f.name -> f.dot).toMap

  /** The reference's format selector (`sis_db_get_format_from_node`,
    * src/core/sis_db.c — codes z/s/b/j/a/c): dispatch to the matching
    * renderer. `b`/`z` produce the packed binary record (M2; parquet
    * handles compression at rest, so `z` = `b` here); `s` is the raw
    * struct (no-op projection). */
  def format(df: DataFrame, code: Char, sdb: SdbSchema.Sdb,
      out: String = "payload"): DataFrame = {
    val fields = sdb.fields.map(_.name)
    val dots = withSchemaDots(sdb)
    code match {
      case 'j' => toJsonRows(df, fields, dots, out)
      case 'a' => toArrayRows(df, fields, dots, out)
      case 'c' => toCsvRows(df, fields, dots, out)
      case 'b' | 'z' => df.withColumn(out,
        graft.sources.BinaryRows.pack(struct(fields.map(col): _*), sdb))
      case 's' => df.withColumn(out, struct(fields.map(col): _*))
      case other => throw new IllegalArgumentException(s"format '$other'")
    }
  }
}
