package graft

import org.scalatest.funsuite.AnyFunSuite

/** Headline-efficiency selection ([[Bench.selectEfficiency]]): the
  * stable-narrow minima rule, the pair fallback, and the pre-registered
  * ≤1.05 physical validity bound — pinned on the committed bench_r4r /
  * bench_r4l trial numbers so a future refactor cannot silently change
  * which number the driver's artifact headlines.
  */
class BenchSelectSpec extends AnyFunSuite {

  // bench_r4r: three complete pairs; the cleanest-BRACKET round (penalty
  // 1.14) had the run's slowest wide (pair 0.762) while the narrow was
  // phase-stable (51.4/52.6/54.7 s, 6% spread) and the run's minima read
  // 0.880 — the headline must be the minima, the pair value preserved.
  private val r4rPairs = Seq((1.44, 0.936, 1), (1.14, 0.762, 2), (1.25, 0.824, 3))
  private val r4rNarrows = Seq(54.74, 52.61, 51.45)

  test("stable narrow headlines the within-run minima ratio (r4r)") {
    val (headline, pair) = Bench.selectEfficiency(r4rPairs, r4rNarrows, 0.880)
    assert(headline === 0.880)
    assert(pair === 0.762)
  }

  test("unstable narrow falls back to the cleanest-bracket pair") {
    // >10% narrow spread: the overstatement channel (an inflated narrow
    // minimum) is open, so the phase-adjacent pair is the honest number
    val (headline, pair) =
      Bench.selectEfficiency(r4rPairs, Seq(51.45, 70.0), 0.880)
    assert(headline === pair)
    assert(pair === 0.762)
  }

  test("a single narrow sample cannot claim stability") {
    val (headline, _) =
      Bench.selectEfficiency(r4rPairs, Seq(51.45), 0.880)
    assert(headline === 0.762)
  }

  test("minima above the 1.05 physical bound falls back to the pair") {
    // super-linear scaling is impossible — a >1.05 minima ratio proves
    // the two minima straddled a host-phase flip
    val (headline, _) =
      Bench.selectEfficiency(r4rPairs, r4rNarrows, 1.144)
    assert(headline === 0.762)
  }

  test("pairs above the 1.05 bound are excluded from selection (r4l)") {
    // bench_r4l: the cleanest-bracket round read 1.144 and would
    // otherwise headline; selection must skip it for the cleanest VALID
    // round even at a worse bracket penalty
    val pairs = Seq((1.05, 1.144, 1), (1.30, 0.608, 2))
    val (_, pair) = Bench.selectEfficiency(pairs, Seq(60.0, 95.0), -1.0)
    assert(pair === 0.608)
  }

  test("no pairs at all: STABLE-narrow minima is the last resort, -1 stays -1") {
    assert(Bench.selectEfficiency(Nil, Seq(50.0, 51.0), 0.9) === ((0.9, -1.0)))
    assert(Bench.selectEfficiency(Nil, Nil, -1.0) === ((-1.0, -1.0)))
  }

  test("no valid pair + unstable narrow: headline is -1, never the minima") {
    // round-5 fix (round-4 ADVICE): the minima ratio is only meaningful
    // behind the stable-narrow precondition — an inflated narrow minimum
    // inflates the ratio, and with no valid pair either, the run has no
    // audited estimator left. It must report unmeasured.
    assert(Bench.selectEfficiency(Nil, Seq(50.0, 70.0), 0.9)._1 === -1.0)
    // same with only an invalid (>1.05) pair present
    assert(Bench.selectEfficiency(
      Seq((1.2, 1.101, 1)), Seq(50.0, 70.0), 0.9)._1 === -1.0)
  }

  test("invalid-only run headlines -1, never a physically-impossible value") {
    // bench_r4s: the run's ONLY pair straddled a phase flip (1.101) and
    // the minima equal it — the headline must report unmeasured (-1)
    // with the raw values left visible in the pair/minima/rounds fields
    val (headline, pair) =
      Bench.selectEfficiency(Seq((1.2, 1.101, 1)), Seq(66.5), 1.101)
    assert(headline === -1.0)
    assert(pair === 1.101)
    // zero pairs + cross-config minima reading super-linear: same clamp
    assert(Bench.selectEfficiency(Nil, Seq(50.0, 51.0), 1.4)._1 === -1.0)
  }
}
