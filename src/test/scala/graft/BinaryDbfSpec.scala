package graft

import graft.fmt.Render
import graft.schema.SdbSchema
import graft.sources.{BinaryRows, Dbf}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** M2 packed-row codec roundtrip, the format dispatcher, and the S8
  * DBF reader against hand-built file bytes. */
class BinaryDbfSpec extends SparkSpec {
  import spark.implicits._

  test("M2 pack/unpack roundtrip across every type family") {
    val sdb = SdbSchema.parse(
      "{t:{fields:{i1:[I,1],i2:[I,2],i8:[I,8],u4:[U,4],f4:[F,4],f8:[F,8]," +
        "p:[P,8,1,2],name:[C,6],tm:[T,8],dt:[D,4],yr:[Y,4]}}}")
    assert(BinaryRows.rowSize(sdb) == 1 + 2 + 8 + 4 + 4 + 8 + 8 + 6 + 8 + 4 + 4)
    val df = Seq((5, 300, 123456789012345L, 4000000000L, 1.5f, 2.25,
        987.65, "abc", java.sql.Timestamp.from(
          java.time.Instant.parse("2021-08-28T01:02:03.456Z")),
        java.sql.Date.valueOf("2021-08-28"), 2021))
      .toDF("i1", "i2", "i8", "u4", "f4", "f8", "p", "name", "tm", "dt", "yr")
      .select(struct(
        col("i1").cast("tinyint").as("i1"), col("i2").cast("smallint").as("i2"),
        col("i8"), col("u4"), col("f4"), col("f8"), col("p"), col("name"),
        col("tm"), col("dt"), col("yr")).as("r"))
    val back = df.select(BinaryRows.unpack(
      BinaryRows.pack(col("r"), sdb), sdb).as("u")).select("u.*").collect()(0)
    assert(back.getByte(0) == 5 && back.getShort(1) == 300)
    assert(back.getLong(2) == 123456789012345L)
    assert(back.getLong(3) == 4000000000L)
    assert(back.getFloat(4) == 1.5f && back.getDouble(5) == 2.25)
    assert(back.getDouble(6) == 987.65) // zint dot=2 exact at 2 decimals
    assert(back.getString(7) == "abc")  // zero-padded C6
    assert(back.getTimestamp(8).toInstant ==
      java.time.Instant.parse("2021-08-28T01:02:03.456Z")) // T stores ms
    assert(back.getDate(9).toString == "2021-08-28")
    assert(back.getInt(10) == 2021)
  }

  test("format dispatcher: j/a/c/b/s codes") {
    val sdb = SdbSchema.parse("{t:{fields:{k:[I,8],px:[P,8,1,2]}}}")
    val d = Seq((1L, 12.5)).toDF("k", "px")
    assert(Render.format(d, 'j', sdb).select("payload").collect()(0).getString(0)
      == """{"k":1,"px":"12.50"}""")
    assert(Render.format(d, 'a', sdb).select("payload").collect()(0).getString(0)
      == """[1,"12.50"]""")
    assert(Render.format(d, 'c', sdb).select("payload").collect()(0).getString(0)
      == "1,12.50")
    val bin = Render.format(d, 'b', sdb).select("payload").collect()(0)
      .getAs[Array[Byte]](0)
    assert(bin.length == BinaryRows.rowSize(sdb))
    assert(Render.format(d, 's', sdb).schema("payload").dataType.typeName == "struct")
  }

  test("S8 DBF reader parses header, types, and skips deleted records") {
    // hand-built DBF: fields CODE C6, PRICE N10.2, VOL N8.0; 3 records,
    // one marked deleted
    val fields = Seq(("CODE", 'C', 6, 0), ("PRICE", 'N', 10, 2), ("VOL", 'N', 8, 0))
    val recordSize = 1 + fields.map(_._3).sum
    val headerSize = 32 + fields.size * 32 + 1
    val records = Seq(
      (" ", "SH6006", "    123.45", "    1000"),
      ("*", "DELETE", "      9.99", "       1"),
      (" ", "SZ0001", "     67.89", "    2000"))
    val buf = java.nio.ByteBuffer.allocate(headerSize + records.size * recordSize + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte).put(24.toByte).put(1.toByte).put(1.toByte)
    buf.putInt(records.size)
    buf.putShort(headerSize.toShort).putShort(recordSize.toShort)
    (12 until 32).foreach(_ => buf.put(0.toByte))
    fields.foreach { case (name, t, len, dec) =>
      val nb = name.getBytes("ASCII")
      buf.put(nb); (nb.length until 11).foreach(_ => buf.put(0.toByte))
      buf.put(t.toByte)
      (0 until 4).foreach(_ => buf.put(0.toByte))
      buf.put(len.toByte).put(dec.toByte)
      (0 until 14).foreach(_ => buf.put(0.toByte))
    }
    buf.put(0x0D.toByte)
    records.foreach { case (flag, c, p, v) =>
      buf.put(flag.getBytes("ASCII"))
      buf.put(c.getBytes("ASCII")); buf.put(p.getBytes("ASCII"))
      buf.put(v.getBytes("ASCII"))
    }
    buf.put(0x1A.toByte)
    val dir = Files.createTempDirectory("graft_dbf")
    Files.write(Paths.get(dir.toString, "day.dbf"), buf.array())

    val df = Dbf.read(spark, dir.toString + "/*.dbf")
    assert(df.schema.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("CODE", "string"), ("PRICE", "double"), ("VOL", "long")))
    val rows = df.orderBy("CODE").collect()
    assert(rows.length == 2) // deleted record skipped
    assert(rows(0).getString(0) == "SH6006" && rows(0).getDouble(1) == 123.45
      && rows(0).getLong(2) == 1000L)
    assert(rows(1).getString(0) == "SZ0001" && rows(1).getDouble(1) == 67.89)
  }

  test("DBF writer rejects silent corruption: over-wide numerics and format limits") {
    import org.apache.spark.sql.Row
    // numeric wider than the field must throw, not keep leftmost digits
    val wide = intercept[IllegalArgumentException] {
      Dbf.serialize(Seq(Dbf.DbfField("V", 'N', 4, 0)),
        Iterator(Row(123456L)))
    }
    assert(wide.getMessage.contains("wider than"))
    // text still truncates (dBase convention)
    val ok = Dbf.serialize(Seq(Dbf.DbfField("S", 'C', 3, 0)),
      Iterator(Row("abcdef")))
    assert(new String(ok, ok.length - 4, 3, "ASCII") == "abc")
    // 8-bit field length limit enforced up front
    intercept[IllegalArgumentException] {
      Dbf.serialize(Seq(Dbf.DbfField("V", 'C', 300, 0)), Iterator.empty)
    }
    // logical null round-trips as '?' (dBase uninitialized), not false
    val lf = Seq(Dbf.DbfField("B", 'L', 1, 0))
    val bytes = Dbf.serialize(lf, Iterator(Row(null), Row(true), Row(false)))
    val h = Dbf.parseHeader(bytes)
    val got = Dbf.parseRecords(bytes, h).map(_.get(0)).toSeq
    assert(got == Seq(null, true, false), s"L round-trip gave $got")
  }
}
