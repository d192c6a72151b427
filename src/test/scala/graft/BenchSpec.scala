package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench's warm-spread contention witness — pure
  * arithmetic, no Spark. The single-warm-sample fallback (a sweep run
  * failed) is gated on BUILD EVIDENCE: a slow first-touch run only
  * reads as benign when it actually built stamped artifacts, so a
  * contended fast-fail sweep can no longer report spread 1.0
  * (round-15 "What's wrong" #2, closed in round 16).
  */
class BenchSpec extends AnyFunSuite {

  private def run(idx: Int, secs: Double, built: Boolean = false) =
    Bench.Run(idx, secs, if (built) Seq("graft_x") else Nil)

  test("three successful runs: spread over the warm pair, first-touch excluded") {
    // first run slow (build), warm runs 1.0 and 4.0 → spread 4.0
    assert(Bench.warmSpread(Seq(run(1, 30.0, built = true),
      run(2, 1.0), run(3, 4.0))) === 4.0)
    // quiet warm pair → 1.25, regardless of a huge first touch
    assert(Bench.warmSpread(Seq(run(1, 50.0), run(2, 4.0), run(3, 5.0))) === 1.25)
  }

  test("single warm sample SLOWER than first-touch: contention witnessed, both included") {
    // run 2 failed; warm run 3 at 9 s vs first 2 s → spread 4.5 (> 3 retimes)
    assert(Bench.warmSpread(Seq(run(1, 2.0), run(3, 9.0))) === 4.5)
  }

  test("single warm sample faster, first-touch BUILT artifacts: explained, reads quiet") {
    assert(Bench.warmSpread(Seq(run(1, 30.0, built = true), run(3, 2.0))) === 1.0)
  }

  test("single warm sample SLOWER than a first-touch that BUILT: unquantifiable, always retimes") {
    // the masked case: 30 s first run includes a ~25 s build, warm run
    // at 35 s under contention — a plain ratio would read 1.17 (quiet)
    // and commit a contended 30 s as the per-query value
    assert(Bench.warmSpread(Seq(run(1, 30.0, built = true), run(3, 35.0)))
      .isPosInfinity)
  }

  test("single warm sample faster, first-touch built NOTHING: unexplained slow first re-enters") {
    // the closed loophole: warm 2 s, first 12 s with no build → 6.0 (> 3 retimes)
    assert(Bench.warmSpread(Seq(run(1, 12.0), run(3, 2.0))) === 6.0)
    // a mildly slower unexplained first stays under the 3× retime bar
    assert(Bench.warmSpread(Seq(run(1, 3.0), run(3, 2.0))) === 1.5)
  }

  test("failure-degenerate shapes read quiet (no spread computable)") {
    assert(Bench.warmSpread(Nil) === 1.0)
    assert(Bench.warmSpread(Seq(run(1, 5.0))) === 1.0)
    assert(Bench.warmSpread(Seq(run(2, 0.0), run(3, 0.0))) === 1.0)
  }

  test("the earliest SUCCESSFUL run is the excluded one, whatever its index") {
    // run 1 failed: run 2 pays first-touch and is excluded; warm = (3, 4)
    assert(Bench.warmSpread(Seq(run(2, 40.0, built = true),
      run(3, 2.0), run(4, 8.0))) === 4.0)
  }
}
