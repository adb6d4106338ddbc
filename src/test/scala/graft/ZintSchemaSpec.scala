package graft

import graft.functions.Zint
import graft.schema.SdbSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** zint64 codec roundtrip (sis_zint.h:8-63) and schema DSL parsing
  * (sis_dynamic.c:114-219). */
class ZintSchemaSpec extends SparkSpec {
  import spark.implicits._

  test("zint scalar roundtrip keeps dot decimals (round-half-up)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 500) {
      val dot = rnd.nextInt(6)
      val v = math.floor(rnd.nextDouble() * 1e8) / math.pow(10, dot)
      val dec = Zint.decode64(Zint.encode64(v, dot)).get
      assert(math.abs(dec - v) <= math.pow(10, -dot) * 0.5 + 1e-9,
        s"v=$v dot=$dot dec=$dec")
    }
  }

  test("zint negative, zero and invalid values") {
    assert(Zint.decode64(Zint.encode64(-123.456, 3)).get == -123.456)
    assert(Zint.decode64(Zint.encode64(0.0, 3)).get == 0.0)
    assert(Zint.decode64(Zint.encode64(1e18, 2)).isEmpty) // out of 58-bit range
  }

  test("zint column expressions match the scalar codec") {
    val vals = Seq(0.0, 1.25, -9876.54, 123456.789, 0.001, 42.0)
    val out = vals.toDF("v")
      .select(col("v"), Zint.decode64(Zint.encode64(col("v"), 3)).as("rt"))
      .collect()
    out.foreach { r =>
      val expect = Zint.decode64(Zint.encode64(r.getDouble(0), 3)).get
      assert(math.abs(r.getDouble(1) - expect) < 1e-12,
        s"column codec diverged for ${r.getDouble(0)}")
    }
  }

  test("schema DSL: types, defaults, flags") {
    val sdb = SdbSchema.parse(
      "{stk_day:{fields:{time:[D,4],open:[P,4,1,2],high:[P,4],vols:[U,4],name:[C,16],arr:[F,8,3]}}}")
    assert(sdb.name == "stk_day")
    val st = sdb.structType
    assert(st("time").dataType == DateType)
    assert(st("open").dataType == DoubleType)
    assert(sdb.dotOf("open") == 2)
    assert(sdb.dotOf("high") == 3) // P defaults dot to 3 (sis_dynamic.c:165-168)
    assert(st("vols").dataType == LongType) // U4 widens to signed 64
    assert(st("name").dataType == StringType)
    assert(st("arr").dataType == ArrayType(DoubleType, containsNull = false))
  }

  test("schema DSL: time field is forced main index; solely flag") {
    val sdb = SdbSchema.parse(
      "{t:{fields:{code:[C,8,1,0,IO],time:[T,8],v:[F,8]}}}")
    assert(sdb.mainIndex.map(_.name).contains("time")) // overrides code's I
    assert(sdb.solelyFields.map(_.name) == Seq("code"))
  }

  test("schema DSL: invalid fields skipped like the reference") {
    val sdb = SdbSchema.parse("{t:{fields:{good:[I,4],bad:[Q,4],worse:[I,9999]}}}")
    assert(sdb.fields.map(_.name) == Seq("good"))
  }
}
