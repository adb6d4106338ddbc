package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** The reference's dynamic schema DSL → Spark `StructType`.
  *
  * Reference (src/core/sis_dynamic.c:114-219, bin/stk.after.conf:2-3):
  * a table ("sdb") is declared as
  * `{fields: {name: [TYPE, len, count, dot, flags], ...}}` where TYPE is
  * one of I/U/C/F/P/W/T/S/M/D/Y (sis_dynamic.h:77-91), `len` the byte
  * width (default 4), `count` a fixed array repeat (default 1), `dot`
  * decimal places for price/string output (P defaults to 3,
  * sis_dynamic.c:165-168), and flags `I` = main index, `O` = unique
  * ("solely"), case-insensitive (sis_dynamic.c:177-178). The first
  * time-typed field (S/T/M/D) is forced to be the main index
  * (sis_dynamic.c:212-215).
  *
  * Mapping (SURVEY.md §1.3): fixed-width ints by len; U widens; C →
  * string; F → float/double; P (zint price) → double for compute with
  * `dot` kept as metadata for formatting (the reference itself renders P
  * as a double with `dot` decimals, sis_dynamic.h:419-424); W/T/S →
  * timestamp; M/Y → int; D → date. `count > 1` → ArrayType. Field
  * metadata carries {style, len, count, dot, mindex, solely} so write
  * paths (solely-upsert) and formatters recover the declaration.
  */
object SdbSchema {

  final case class Field(
      name: String, style: Char, len: Int, count: Int, dot: Int,
      mindex: Boolean, solely: Boolean) {
    def sparkType: DataType = {
      val elem: DataType = style match {
        case 'I' => len match {
          case 1 => ByteType
          case 2 => ShortType
          case 8 => LongType
          case _ => IntegerType
        }
        case 'U' => len match { // unsigned → next-wider signed
          case 1 => ShortType
          case 2 => IntegerType
          case _ => LongType
        }
        case 'C' => StringType
        case 'F' => if (len >= 8) DoubleType else FloatType
        case 'P' => DoubleType // + dot metadata; storage codec is zint
        case 'W' | 'T' | 'S' => TimestampType
        case 'M' | 'Y' => IntegerType
        case 'D' => DateType
        case other => throw new IllegalArgumentException(s"bad style $other")
      }
      if (count > 1) ArrayType(elem, containsNull = false) else elem
    }

    def structField: StructField = StructField(
      name, sparkType, nullable = true,
      new MetadataBuilder()
        .putString("style", style.toString)
        .putLong("len", len.toLong)
        .putLong("count", count.toLong)
        .putLong("dot", dot.toLong)
        .putBoolean("mindex", mindex)
        .putBoolean("solely", solely)
        .build())
  }

  final case class Sdb(name: String, fields: Seq[Field]) {
    def structType: StructType = StructType(fields.map(_.structField))
    /** The main (time) index — a time-typed field wins over an `I` flag
      * (sis_dynamic.c:212-215). */
    def mainIndex: Option[Field] =
      fields.find(f => "WTSMD".contains(f.style))
        .orElse(fields.find(_.mindex))
    def solelyFields: Seq[Field] = fields.filter(_.solely)
    def dotOf(field: String): Int =
      fields.find(_.name == field).map(_.dot).getOrElse(0)
    /** Canonical DSL round-trip (`parse(toDsl) == this`) — the durable
      * form the engine persists so a restarted process recovers its
      * table declarations from disk (the reference reloads sdb dicts
      * from conf/disk heads at init, workers/sisdb/sisdb.c:603-639). */
    def toDsl: String = {
      val fs = fields.map { f =>
        val flags = (if (f.mindex) "I" else "") + (if (f.solely) "O" else "")
        s"${f.name}:[${f.style},${f.len},${f.count},${f.dot}" +
          (if (flags.nonEmpty) s",$flags]" else "]")
      }.mkString(",")
      s"{$name:{fields:{$fs}}}"
    }
  }

  private val mapper = new ObjectMapper()
  private val styles: Map[String, Char] = Map(
    "i" -> 'I', "int" -> 'I', "u" -> 'U', "uint" -> 'U',
    "c" -> 'C', "char" -> 'C', "f" -> 'F', "float" -> 'F',
    "p" -> 'P', "price" -> 'P', "w" -> 'W', "wsec" -> 'W',
    "t" -> 'T', "msec" -> 'T', "s" -> 'S', "second" -> 'S',
    "m" -> 'M', "minute" -> 'M', "d" -> 'D', "date" -> 'D',
    "y" -> 'Y', "year" -> 'Y')

  /** Parse `{table: {fields: {...}}}`, `{fields: {...}}` or a bare
    * field map. Invalid fields are skipped like the reference
    * (sis_dynamic.c:146-163); JSON5-ish unquoted keys are accepted. */
  def parse(dsl: String, name: String = "sdb"): Sdb = {
    val root = mapper.readTree(quoteBareWords(dsl))
    val (tableName, body) =
      if (root.has("fields")) (name, root)
      else {
        val entries = root.properties().asScala.toSeq
        entries.find(_.getValue.has("fields")) match {
          case Some(e) => (e.getKey, e.getValue)
          case None => (name, mapper.createObjectNode().set[JsonNode]("fields", root))
        }
      }
    val fieldsNode = body.get("fields")
    val fields = fieldsNode.properties().asScala.toSeq.flatMap { e =>
      parseField(e.getKey, e.getValue)
    }
    require(fields.nonEmpty, s"schema '$tableName' declares no valid fields")
    Sdb(tableName, fields.toSeq)
  }

  private def parseField(name: String, spec: JsonNode): Option[Field] = {
    if (!spec.isArray || spec.size() == 0) return None
    val styleStr = spec.get(0).asText("").toLowerCase
    styles.get(styleStr).flatMap { style =>
      val len = if (spec.size() > 1) spec.get(1).asInt(4) else 4
      val count = if (spec.size() > 2) spec.get(2).asInt(1) else 1
      val dot0 = if (spec.size() > 3) spec.get(3).asInt(0) else 0
      val dot = if (style == 'P' && dot0 == 0) 3 else dot0
      val flags = if (spec.size() > 4) spec.get(4).asText("") else ""
      // len/count caps per SIS_DYNAMIC_FIELD_LIMIT checks
      if (len < 1 || len > 4096 || count < 1 || count > 4096) None
      else Some(Field(name, style, len, count, dot,
        mindex = flags.toUpperCase.contains('I'),
        solely = flags.toUpperCase.contains('O')))
    }
  }

  /** The reference's conf format allows unquoted keys and bare type
    * letters (`{open:[P,4,1,2]}`); quote them so Jackson accepts it. */
  private[graft] def quoteBareWords(s: String): String =
    """(?<=[\{\[,:])\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?=[:,\]\}])""".r
      .replaceAllIn(s, m => "\"" + m.group(1) + "\"")
}
