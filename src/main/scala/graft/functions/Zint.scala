package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's "zint" scaled-decimal price codec
  * (src/core/zip/sis_zint.h:8-63) as column expressions and a plain
  * Scala codec (property-tested roundtrip).
  *
  * zint64 layout (low→high): 58-bit magnitude, 5-bit attr (decimal
  * scale 1..30; 0 = unscaled; 0x1F = invalid), 1 sign bit. Encoding
  * scales the magnitude by 10 up to `dot` times while it fits in 58
  * bits, then rounds half-up; decode divides back by 10^attr. The
  * invalid marker maps to SQL null (SURVEY.md §1.3).
  *
  * All arithmetic is double-based exactly like the C (the codec is a
  * *storage* format; value fidelity is "round-trips at `dot` decimals").
  */
object Zint {
  final val Max58 = 0x03FFFFFFFFFFFFFFL
  private final val AttrInvalid = 31L

  // ── column expressions (codegen'd built-ins only, no UDF) ──────────

  /** Encode a double into zint64 bits with up to `dot` decimals kept. */
  def encode64(v: Column, dot: Int): Column = {
    val maxdot = math.min(dot, 30)
    val mag = abs(v)
    // attr = number of ×10 scalings before the magnitude would exceed
    // 58 bits, capped at dot (the C loop in sis_zint.h:28-63 unrolled:
    // the FIRST k with mag*10^k > MAX stops the loop at attr = k-1)
    val attrFirst = (1 to maxdot)
      .map(k => (k, mag * lit(math.pow(10, k)) > lit(Max58.toDouble)))
      .foldRight(lit(maxdot): Column) { case ((k, cond), rest) =>
        when(cond, lit(k - 1)).otherwise(rest)
      }
    val zint = floor(mag * pow(lit(10.0), attrFirst) + 0.5).cast("long")
    val attrFinal = when(zint === 0, 0L).otherwise(attrFirst.cast("long"))
    val sign = when(v < 0, 1L).otherwise(0L)
    val valid = v.isNotNull && mag <= lit(Max58.toDouble)
    when(!valid, lit(AttrInvalid << 58))
      .when(abs(v) < 1e-7, lit(0L)) // SIS_IS_ZERO → all-zero word
      .otherwise(shiftleft(sign, 63)
        .bitwiseOR(shiftleft(attrFinal, 58))
        .bitwiseOR(zint))
  }

  /** Decode zint64 bits back to a double (null when invalid). */
  def decode64(z: Column): Column = {
    val attr = shiftrightunsigned(z, 58).bitwiseAND(lit(0x1FL))
    val sign = shiftrightunsigned(z, 63)
    val mant = z.bitwiseAND(lit(Max58))
    val mag = mant.cast("double") / pow(lit(10.0), attr.cast("double"))
    when(attr === AttrInvalid, lit(null).cast("double"))
      .otherwise(when(sign === 1, -mag).otherwise(mag))
  }

  // ── plain Scala codec (tests, driver-side tools) ───────────────────

  def encode64(v: Double, dot: Int): Long = {
    if (v.isNaN || v > Max58.toDouble || v < -Max58.toDouble)
      return AttrInvalid << 58
    if (math.abs(v) < 1e-7) return 0L
    val sign = if (v < 0) 1L else 0L
    var in = math.abs(v)
    var attr = 0L
    val maxdot = math.min(dot, 30)
    var i = 0
    var stop = false
    while (i < maxdot && !stop) {
      if (in * 10 > Max58.toDouble) { attr = i; stop = true }
      else { attr = i + 1; in = in * 10 }
      i += 1
    }
    val zint = (in + 0.5).toLong & Max58
    val attrF = if (zint != 0) attr else 0L
    (sign << 63) | (attrF << 58) | zint
  }

  /** zint32: 28-bit magnitude, 3-bit scale (7 = invalid), 1 sign bit
    * (sis_zint.h:8-17, encode :28-63). */
  final val Max28 = 0x0FFFFFFF
  def encode32(v: Double, dot: Int): Int = {
    if (v.isNaN || v > Max28.toDouble || v < -Max28.toDouble)
      return 7 << 28
    if (math.abs(v) < 1e-7) return 0
    val sign = if (v < 0) 1 else 0
    var in = math.abs(v)
    var attr = 0
    val maxdot = math.min(dot, 6)
    var i = 0
    var stop = false
    while (i < maxdot && !stop) {
      if (in * 10 > Max28.toDouble) { attr = i; stop = true }
      else { attr = i + 1; in = in * 10 }
      i += 1
    }
    val zint = (in + 0.5).toInt & Max28
    val attrF = if (zint != 0) attr else 0
    (sign << 31) | (attrF << 28) | zint
  }

  def decode32(z: Int): Option[Double] = {
    val attr = (z >>> 28) & 0x7
    if (attr == 7) return None
    val sign = z >>> 31
    val mag = (z & Max28).toDouble / math.pow(10, attr.toDouble)
    Some(if (sign == 1) -mag else mag)
  }

  def decode64(z: Long): Option[Double] = {
    val attr = (z >>> 58) & 0x1FL
    if (attr == AttrInvalid) return None
    val sign = z >>> 63
    val mant = z & Max58
    val mag = mant.toDouble / math.pow(10, attr.toDouble)
    Some(if (sign == 1) -mag else mag)
  }
}
