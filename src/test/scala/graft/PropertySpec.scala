package graft

import graft.functions.{Fnv1a64Expr, TimeUnits, Zint}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure codecs (SURVEY §5: property-based
  * upsert/sort/time/zint invariants; the DataFrame-level ones live in
  * the ScalaTest suites, these cover the scalar kernels exhaustively).
  */
object CodecProperties extends Properties("graft.codecs") {

  // ── zint ───────────────────────────────────────────────────────────

  private val dotGen = Gen.choose(0, 6)
  private val priceGen = Gen.choose(-2.68e8, 2.68e8)

  property("zint64 roundtrip error bounded by half an ulp of dot") =
    // the relative term covers double rounding when |v|·10^dot nears
    // 2^52 (identical behavior to the C's double-based scaling)
    forAll(priceGen, dotGen) { (v, dot) =>
      Zint.decode64(Zint.encode64(v, dot)) match {
        case Some(dec) =>
          math.abs(dec - v) <= math.pow(10, -dot) / 2 + math.abs(v) * 1e-13 + 1e-9
        case None => false
      }
    }

  property("zint64 sign preserved") = forAll(priceGen, dotGen) { (v, dot) =>
    Zint.decode64(Zint.encode64(v, dot)).exists(d =>
      math.signum(d) == math.signum(v) || math.abs(v) < 1.0)
  }

  property("zint32 roundtrip within the ACHIEVED precision") =
    // zint32 drops decimals when magnitude*10^dot overflows 28 bits
    // (sis_zint.h:9: two decimals lossless only up to ~2.68M), so the
    // bound is half an ulp of the attr actually stored, not of `dot`
    forAll(Gen.choose(-2.6e7, 2.6e7), dotGen) { (v, dot) =>
      val z = Zint.encode32(v, dot)
      val attr = (z >>> 28) & 0x7
      Zint.decode32(z).exists(dec =>
        math.abs(dec - v) <= math.pow(10, -attr.toDouble) / 2 + 1e-9)
    }

  property("zint64 out-of-range encodes invalid, decodes to None") =
    forAll(Gen.choose(2.9e17, 1e18)) { v =>
      Zint.decode64(Zint.encode64(v, 2)).isEmpty
    }

  // ── fnv1a64 ────────────────────────────────────────────────────────

  property("fnv1a64 deterministic and sensitive to any byte change") =
    forAll(Gen.alphaNumStr, Gen.choose(0, 1000)) { (s, salt) =>
      val b = s.getBytes("UTF-8")
      val h1 = Fnv1a64Expr.hash(b)
      val h2 = Fnv1a64Expr.hash(b)
      val mutated = (s + salt.toString).getBytes("UTF-8")
      h1 == h2 && (mutated.sameElements(b) || Fnv1a64Expr.hash(mutated) != h1)
    }
}

/** Scalar time-unit invariants (the column versions are asserted over
  * DataFrames in TimeUnitsSpec; these pin the arithmetic corners). */
object TimeUnitProperties extends Properties("graft.timeunits") {

  private val secGen = Gen.choose(0L, 4102444800L) // through 2100

  property("S→T lands in the SAME second (end-of-interval +999)") =
    forAll(secGen) { s =>
      val ms = s * 1000L + 999L // per sis_dynamic.c:356
      ms / 1000L == s
    }

  property("M→T lands in the SAME minute (+59999)") =
    forAll(Gen.choose(0L, 68400000L)) { m =>
      val ms = m * 60000L + 59999L
      ms / 60000L == m
    }

  property("day-int arithmetic roundtrips through epoch day") =
    forAll(Gen.choose(0, 365 * 130)) { epochDay =>
      val d = java.time.LocalDate.ofEpochDay(epochDay.toLong)
      val dayInt = d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
      val back = java.time.LocalDate.of(dayInt / 10000, dayInt / 100 % 100,
        dayInt % 100)
      back.toEpochDay == epochDay.toLong
    }
}
