package graft.sources

import graft.functions.Zint
import graft.schema.SdbSchema
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.{ByteBuffer, ByteOrder}

/** M2 `bset` binary rows: the reference's wire/storage format is one
  * packed little-endian struct per record (`#pragma pack(push,1)`,
  * src/core/sis_dynamic.h:96; offsets accumulate per field,
  * sis_dynamic.c:179-182). [[PackSdbExpr]] renders a typed row into
  * those bytes; [[UnpackSdbExpr]] parses them back, honoring the
  * declared widths: I/U at 1/2/4/8, F at 4/8, C fixed-length
  * zero-padded, P stored as zint32/zint64 (sis_zint.h:8-63), time
  * styles T(ms8)/S(sec len)/W(µs8)/M(min4)/D(dateint4)/Y(year4),
  * `count>1` fields repeated inline.
  */
object BinaryRows {

  private def fieldWidth(f: SdbSchema.Field): Int = f.len * f.count

  def rowSize(sdb: SdbSchema.Sdb): Int = sdb.fields.map(fieldWidth).sum

  // ── pack ───────────────────────────────────────────────────────────

  case class PackSdbExpr(child: Expression, sdb: SdbSchema.Sdb)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StructType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"pack needs a struct, got $t")
    }

    override def nullSafeEval(input: Any): Any = {
      val row = input.asInstanceOf[InternalRow]
      val buf = ByteBuffer.allocate(rowSize(sdb)).order(ByteOrder.LITTLE_ENDIAN)
      sdb.fields.zipWithIndex.foreach { case (f, idx) =>
        if (f.count > 1) {
          val arr =
            if (row.isNullAt(idx)) null
            else row.getArray(idx)
          (0 until f.count).foreach { i =>
            val v =
              if (arr == null || i >= arr.numElements() || arr.isNullAt(i)) null
              else arr.get(i, elementType(f))
            packOne(buf, f, v)
          }
        } else {
          val v = if (row.isNullAt(idx)) null else row.get(idx, f.sparkType)
          packOne(buf, f, v)
        }
      }
      buf.array()
    }

    override protected def withNewChildInternal(newChild: Expression): PackSdbExpr =
      copy(child = newChild)
  }

  private def elementType(f: SdbSchema.Field): DataType = f.sparkType match {
    case ArrayType(e, _) => e
    case t => t
  }

  private def numLong(v: Any): Long = v match {
    case null => 0L
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case f: Float => f.toLong
    case d: Double => d.toLong
    case _ => 0L
  }

  private def numDouble(v: Any): Double = v match {
    case null => 0.0
    case f: Float => f.toDouble
    case d: Double => d
    case other => numLong(other).toDouble
  }

  private def packOne(buf: ByteBuffer, f: SdbSchema.Field, v: Any): Unit = {
    f.style match {
      case 'I' | 'U' =>
        val l = numLong(v)
        f.len match {
          case 1 => buf.put(l.toByte)
          case 2 => buf.putShort(l.toShort)
          case 8 => buf.putLong(l)
          case _ => buf.putInt(l.toInt)
        }
      case 'F' =>
        if (f.len >= 8) buf.putDouble(numDouble(v)) else buf.putFloat(numDouble(v).toFloat)
      case 'P' =>
        if (f.len >= 8) buf.putLong(Zint.encode64(numDouble(v), f.dot))
        else buf.putInt(Zint.encode32(numDouble(v), f.dot))
      case 'C' =>
        val bytes = v match {
          case null => Array.empty[Byte]
          case u: UTF8String => u.getBytes
          case s: String => s.getBytes("UTF-8")
          case _ => Array.empty[Byte]
        }
        val n = math.min(bytes.length, f.len)
        buf.put(bytes, 0, n)
        (n until f.len).foreach(_ => buf.put(0.toByte))
      case 'T' => // timestamp internal = µs → ms8
        buf.putLong(numLong(v) / 1000L)
      case 'W' => // µs8
        buf.putLong(numLong(v))
      case 'S' => // seconds, 4 or 8
        val sec = numLong(v) / 1000000L
        if (f.len >= 8) buf.putLong(sec) else buf.putInt(sec.toInt)
      case 'M' => buf.putInt(numLong(v).toInt)
      case 'D' => // DateType internal = days since epoch → int yyyymmdd
        val d = java.time.LocalDate.ofEpochDay(numLong(v))
        buf.putInt(d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth)
      case 'Y' => buf.putInt(numLong(v).toInt)
      case _ => (0 until f.len).foreach(_ => buf.put(0.toByte))
    }
  }

  // ── unpack ─────────────────────────────────────────────────────────

  case class UnpackSdbExpr(child: Expression, sdb: SdbSchema.Sdb)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = sdb.structType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"unpack needs binary, got $t")
    }

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      if (bytes.length < rowSize(sdb)) return null
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val vals = sdb.fields.map { f =>
        if (f.count > 1)
          new GenericArrayData(
            Array.fill[Any](f.count)(unpackOne(buf, f)))
        else unpackOne(buf, f)
      }
      InternalRow.fromSeq(vals)
    }

    override protected def withNewChildInternal(newChild: Expression): UnpackSdbExpr =
      copy(child = newChild)
  }

  private def unpackOne(buf: ByteBuffer, f: SdbSchema.Field): Any = f.style match {
    case 'I' => f.len match {
      case 1 => buf.get()
      case 2 => buf.getShort()
      case 8 => buf.getLong()
      case _ => buf.getInt()
    }
    case 'U' => f.len match { // widened to the next signed type
      case 1 => (buf.get() & 0xFF).toShort
      case 2 => (buf.getShort() & 0xFFFF)
      case 8 => buf.getLong()
      case _ => buf.getInt() & 0xFFFFFFFFL
    }
    case 'F' => if (f.len >= 8) buf.getDouble() else buf.getFloat()
    case 'P' =>
      if (f.len >= 8) Zint.decode64(buf.getLong()).map(Double.box).orNull
      else Zint.decode32(buf.getInt()).map(Double.box).orNull
    case 'C' =>
      val arr = new Array[Byte](f.len)
      buf.get(arr)
      var n = f.len
      while (n > 0 && arr(n - 1) == 0) n -= 1
      UTF8String.fromBytes(arr, 0, n)
    case 'T' => buf.getLong() * 1000L // ms → µs internal
    case 'W' => buf.getLong()
    case 'S' => (if (f.len >= 8) buf.getLong() else buf.getInt().toLong) * 1000000L
    case 'M' => buf.getInt()
    case 'D' =>
      val di = buf.getInt()
      java.time.LocalDate.of(di / 10000, di / 100 % 100, di % 100)
        .toEpochDay.toInt
    case 'Y' => buf.getInt()
    case _ => null
  }

  // ── column API ─────────────────────────────────────────────────────

  import org.apache.spark.sql.graftbridge.ColumnBridge._

  /** Pack a struct column of the schema's fields into packed bytes. */
  def pack(row: Column, sdb: SdbSchema.Sdb): Column =
    column(PackSdbExpr(expression(row), sdb))

  /** Unpack packed bytes into a struct column typed per the schema. */
  def unpack(bytes: Column, sdb: SdbSchema.Sdb): Column =
    column(UnpackSdbExpr(expression(bytes), sdb))
}
