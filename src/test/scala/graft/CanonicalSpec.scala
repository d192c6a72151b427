package graft

import java.time.{Instant, LocalDate}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Canonical

/** Property tests for the canonical renderer (SURVEY §2.2): format
  * invariants that the oracle comparison depends on. Uses scalacheck
  * directly (no scalatest bridge in the dependency set).
  */
class CanonicalSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("integral doubles below 1e15 render as integers") {
    check("int-doubles", Prop.forAll(Gen.choose(-999999999L, 999999999L)) { n =>
      Canonical.token(n.toDouble) == n.toString
    })
  }

  test("non-integral doubles render with ≤6 fractional digits, zeros stripped") {
    check("frac-doubles", Prop.forAll(Gen.choose(-1e6, 1e6).suchThat(d => !d.isWhole)) { d =>
      val t = Canonical.token(d)
      t.contains(".") && !t.endsWith("0") && !t.endsWith(".") &&
        t.split("\\.")(1).length <= 6
    })
  }

  test("doubles and equal-valued decimals render identically") {
    check("dec-vs-double", Prop.forAll(Gen.choose(-99999999L, 99999999L)) { cents =>
      val d = cents / 100.0
      val bd = new java.math.BigDecimal(cents).movePointLeft(2)
      Canonical.token(d) == Canonical.token(bd)
    })
  }

  test("midnight timestamps have no fractional part; micros render when present") {
    val midnight = Instant.parse("2001-09-01T00:00:00Z")
    assert(Canonical.token(midnight) == "2001-09-01 00:00:00")
    assert(Canonical.token(midnight.plusNanos(1000)) == "2001-09-01 00:00:00.000001")
    assert(Canonical.token(LocalDate.of(1995, 1, 1)) == "1995-01-01")
  }

  test("NULL, booleans, arrays and empty render") {
    assert(Canonical.token(null) == "NULL")
    assert(Canonical.token(true) == "true")
    assert(Canonical.token(Seq(1.0, 2.5, null)) == "[1,2.5,NULL]")
    assert(Canonical.render(Seq()) == "")
    // the certified empty hash (L02 at sf0.01)
    assert(Canonical.sha256Hex("").take(16) == "e3b0c44298fc1c14")
  }
}
