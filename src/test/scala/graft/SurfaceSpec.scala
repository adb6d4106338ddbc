package graft

import graft.fmt.Render
import graft.ops.Convert
import graft.schema.SdbSchema
import graft.sources.Sources
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S7/S9/S10 and the dynamic convert: formatters, typed CSV/JSON
  * ingest, never-cross-type-coerce alignment. */
class SurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("S10 CSV render quotes only separator-bearing values; dot formatting") {
    val d = Seq((1L, "plain", 12.5), (2L, "a,b", 3.0)).toDF("id", "s", "p")
    val out = Render.toCsvRows(d, Seq("id", "s", "p"), dots = Map("p" -> 2))
      .select("csv").collect().map(_.getString(0)).toSeq
    assert(out == Seq("1,plain,12.50", "2,\"a,b\",3.00"))
  }

  test("S10 JSON and array renders") {
    val d = Seq((7L, "x")).toDF("id", "s")
    val js = Render.toJsonRows(d, Seq("id", "s")).select("json")
      .collect()(0).getString(0)
    assert(js == """{"id":7,"s":"x"}""")
    val arr = Render.toArrayRows(d, Seq("id", "s")).select("arr")
      .collect()(0).getString(0)
    assert(arr == """[7,"x"]""")
  }

  test("S7 CSV round-trip through an SdbSchema-typed read") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    val src = Seq((1L, 10.5, "A"), (2L, 20.25, "B")).toDF("k", "p", "f")
    Sources.writeCsv(src, tmp)
    val sdb = SdbSchema.parse("{t:{fields:{k:[I,8],p:[F,8],f:[C,1]}}}")
    val back = Sources.readCsv(spark, tmp, sdb).orderBy("k").collect()
    assert(back.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ==
      Seq((1L, 10.5, "A"), (2L, 20.25, "B")))
  }

  test("S9 JSON-object rows parse to typed columns") {
    val sdb = SdbSchema.parse("{t:{fields:{k:[I,8],v:[F,8]}}}")
    val d = Seq("""{"k": 5, "v": 2.5}""", """{"k": 6, "v": 3.5}""").toDF("j")
    val out = Sources.fromJsonRows(d, "j", sdb).drop("j").orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((5L, 2.5), (6L, 3.5)))
  }

  test("S9 positional array rows parse in declared field order") {
    val sdb = SdbSchema.parse("{t:{fields:{k:[I,8],name:[C,4],v:[F,8]}}}")
    val d = Seq("""[5, "ab", 2.5]""").toDF("a")
    val out = Sources.fromArrayRows(d, "a", sdb).drop("a").collect()(0)
    assert((out.getLong(0), out.getString(1), out.getDouble(2)) == ((5L, "ab", 2.5)))
  }

  test("convert: same-style carries, cross-type zeroes, missing zeroes") {
    val v1 = SdbSchema.parse("{t:{fields:{a:[F,8],b:[C,4],c:[I,4]}}}")
    val v2 = SdbSchema.parse("{t:{fields:{a:[I,4],b:[C,8],c:[I,8],d:[F,8]}}}")
    val src = Seq((1.5, "hi", 7)).toDF("a", "b", "c")
    val out = Convert.align(src, v1, v2).collect()(0)
    assert(out.getInt(0) == 0)        // F→I never coerced
    assert(out.getString(1) == "hi")  // same style, wider len
    assert(out.getLong(2) == 7L)      // numeric widening same style
    assert(out.getDouble(3) == 0.0)   // missing → 0
  }
}
