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

  test("a quiet bracketed round is valid; the 25% boundary is inclusive") {
    assert(Bench.roundIsValid(Seq(150, 146, 152, 160), 140))
    assert(Bench.roundIsValid(Seq(175, 175, 175, 175), 140))  // exactly 1.25×
    assert(!Bench.roundIsValid(Seq(176, 140, 140, 140), 140)) // one dirty endpoint
    assert(!Bench.roundIsValid(Nil, 140)) // no probes = no evidence
  }
}
