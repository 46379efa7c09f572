package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench ladder's round-validity rule, pinned against the round-3
  * forensic values that motivated it: a round whose ALU probes show host
  * vCPU throttling must never contribute to a headline efficiency. */
class BenchValiditySpec extends AnyFunSuite {

  test("the round-3 throttled graded round is invalid (700 ms probe vs 140 floor)") {
    // BENCH_r03.json alu_ms_legs [145,168,700], floor 140 — this round
    // published a physically impossible 2→8 efficiency of 1.507
    assert(!Bench.roundIsValid(Seq(145, 168, 700), floorMs = 140))
  }

  test("the round-3 hardened run's rounds are ALSO invalid under bracketing") {
    // BENCH/run_1.json: [140,146,496] and [145,407,155] — each round had
    // one dirty probe; the strict rule rejects both (its 0.897 stays
    // builder-committed evidence, not a driver headline)
    assert(!Bench.roundIsValid(Seq(140, 146, 496), 140))
    assert(!Bench.roundIsValid(Seq(145, 407, 155), 140))
  }

  test("leg validity: run_9 round 2 keeps its clean 8c leg, drops the rest") {
    // BENCH/run_9.json round 2 probed [240,146,146,299] (floor 139) with
    // ladder order (32c, 8c, 2c): the 8c leg sat between two quiet probes
    // and its 13.2 s matched the quiet-window reference, but round-level
    // gating discarded it. Leg-level keeps it — and still rejects the legs
    // actually bracketed by dirty probes.
    val alus = Seq[Double](240, 146, 146, 299)
    assert(!Bench.legIsValid(alus, 0, 139)) // 32c: 240 dirty
    assert(Bench.legIsValid(alus, 1, 139))  // 8c: 146/146 quiet
    assert(!Bench.legIsValid(alus, 2, 139)) // 2c: 299 dirty
    // an efficiency sample needs BOTH its legs valid — this round yields
    // none (the spec mirrors pairValidIdx's conjunction)
    assert(!(Bench.legIsValid(alus, 1, 139) && Bench.legIsValid(alus, 2, 139)))
  }

  test("leg validity requires a closing probe (no bracketing = no evidence)") {
    assert(!Bench.legIsValid(Seq(140, 140), 1, 140)) // leg 1 has no probe 2
    assert(Bench.legIsValid(Seq(140, 140), 0, 140))
  }

  test("a quiet bracketed round is valid; the 25% boundary is inclusive") {
    assert(Bench.roundIsValid(Seq(150, 146, 152, 160), 140))
    assert(Bench.roundIsValid(Seq(175, 175, 175, 175), 140))  // exactly 1.25×
    assert(!Bench.roundIsValid(Seq(176, 140, 140, 140), 140)) // one dirty endpoint
    assert(!Bench.roundIsValid(Nil, 140)) // no probes = no evidence
  }
}
