package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderValueN

/** Pure-function property pins for the newest primitives — the parts
  * whose correctness is an algebraic law, not a fixture:
  *
  *  - the chunker's window arithmetic (coverage, bounds, no redundant
  *    tails) over arbitrary (n, maxTokens, stride);
  *  - the N-ary Morton interleave (bijective on its domain, prefix
  *    locality).
  *
  * These mirror the distributed operators' kernels driver-side, so the
  * laws run hundreds of cases without a Spark job per case (same idiom
  * as CanonicalSpec).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: $res")
  }

  /** Driver-side mirror of chunkDocuments' start/keep arithmetic. */
  private def chunkStarts(n: Int, maxTokens: Int, stride: Int): Seq[Int] =
    (0 to math.max(n - 1, 0) by stride)
      .filter(s => s == 0 || s + maxTokens - stride < n)

  test("chunker law: full coverage, no redundant tail, bounded overlap work") {
    val gen = for {
      n <- Gen.choose(0, 500)
      max <- Gen.choose(1, 120)
      stride <- Gen.choose(1, max)
    } yield (n, max, stride)
    check("chunker", Prop.forAll(gen) { case (n, max, stride) =>
      val starts = chunkStarts(n, max, stride)
      val covered = starts.flatMap(s => s until math.min(n, s + max)).toSet
      val coverage = covered == (0 until n).toSet
      val noRedundantTail = starts.sliding(2).forall {
        case Seq(a, b) => math.min(n, b + max) > math.min(n, a + max)
        case _ => true
      }
      val emitted = starts.map(s => math.min(n, s + max) - s).sum
      val bounded = emitted <= (n.toDouble * max / stride).ceil.toInt + max
      coverage && noRedundantTail && bounded
    })
  }

  test("N-ary Morton law: bijective on its domain and prefix-local") {
    val gen: Gen[(Int, Array[Long])] = for {
      nDims <- Gen.choose(2, 6)
      vs <- Gen.listOfN(nDims, Gen.choose(0L, (1L << (62 / nDims)) - 1))
    } yield (nDims, vs.toArray)
    check("morton", Prop.forAll(gen) { case (nDims, vs) =>
      val bits = 62 / nDims
      val z = ZOrderValueN.interleaveN(vs, bits)
      // de-interleave recovers every input exactly (bijectivity)
      val back = Array.tabulate(nDims) { j =>
        (0 until bits).foldLeft(0L)((acc, i) =>
          acc | (((z >> (i * nDims + j)) & 1L) << i))
      }
      // prefix locality: clearing the lowest bit of every input must
      // leave all higher interleaved bits unchanged (the Morton-block
      // property behind the data-skipping layout)
      val zb = ZOrderValueN.interleaveN(vs.map(_ & ~1L), bits)
      back.sameElements(vs) && (z >> nDims) == (zb >> nDims)
    })
  }

  test("hexCutoff law: 8-hex or sentinel, monotone, and admits ~f of the coin space") {
    check("hexCutoff", Prop.forAll(Gen.choose(0.0, 1.0)) { f =>
      val cut = graft.ops.Scale.hexCutoff(f)
      // never the 9-char overflow ("100000000") that keeps 1/16 of rows
      val wellFormed = cut == "g" || (cut.length == 8 && cut.forall(c =>
        c.isDigit || (c >= 'a' && c <= 'f')))
      // admitted fraction ≈ f (coin space is uniform 8-hex strings)
      val admitted =
        if (cut == "g") 1.0
        else java.lang.Long.parseLong(cut, 16).toDouble / 4294967296.0
      wellFormed && math.abs(admitted - f) < 1e-6
    })
    // monotone: a larger fraction never admits fewer coins
    check("hexCutoff-monotone", Prop.forAll(
      Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val (cl, ch) = (graft.ops.Scale.hexCutoff(lo), graft.ops.Scale.hexCutoff(hi))
      ch == "g" || (cl != "g" && cl <= ch)
    })
    // the one-ulp-below-1.0 edge stays clamped to the 8-hex maximum
    assert(graft.ops.Scale.hexCutoff(0.9999999999999999) == "ffffffff")
    assert(graft.ops.Scale.hexCutoff(1.0) == "g")
  }

  test("Morton out-of-range inputs are refused for every dimension count") {
    (2 to 6).foreach { nDims =>
      val bits = 62 / nDims
      val vs = Array.fill(nDims)(0L)
      vs(nDims - 1) = 1L << bits
      intercept[IllegalArgumentException] {
        ZOrderValueN.interleaveN(vs, bits)
      }
    }
  }
}
