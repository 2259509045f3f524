package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's cross-run reference rules are the gate that protects every
  * other gate — a reference that drifts upward turns real regressions
  * invisible (the r12 near-miss: four contended mins one commit away from
  * becoming heal thresholds), one that drifts downward latches false
  * alarms forever. These laws pin both update rules and the parser that
  * feeds them, with no Spark session involved.
  */
class BenchRefSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  private def body(fields: String): String =
    s"""{"metric":"total",$fields,"sf":"$sf"}"""

  // ---- parsePriorMin ------------------------------------------------------

  test("parsePriorMin prefers the monotone queries_ref block over raw queries") {
    val txt = body(
      """"queries":{"a":5.415,"b":0.2},"queries_ref":{"a":0.422,"b":0.2}""")
    assert(Bench.parsePriorMin(txt, sf) == Map("a" -> 0.422, "b" -> 0.2))
  }

  test("parsePriorMin falls back to raw queries for pre-r13 files") {
    val txt = body(""""queries":{"a":1.5,"b":0.25}""")
    assert(Bench.parsePriorMin(txt, sf) == Map("a" -> 1.5, "b" -> 0.25))
  }

  test("parsePriorMin degrades to empty on an sf mismatch or garbage") {
    val txt = body(""""queries_ref":{"a":0.4}""")
    assert(Bench.parsePriorMin(txt, "/root/testdata/sf0.01").isEmpty)
    assert(Bench.parsePriorMin("not json at all", sf).isEmpty)
  }

  // ---- parsePriorFlagship -------------------------------------------------

  test("parsePriorFlagship reads flagship_ref, falling back to the rate") {
    assert(Bench.parsePriorFlagship(
      body(""""flagship_ref":523452,"pipeline_elements_per_sec":374976"""),
      sf) == 523452.0)
    assert(Bench.parsePriorFlagship(
      body(""""pipeline_elements_per_sec":374976"""), sf) == 374976.0)
  }

  test("parsePriorFlagship accepts scientific notation (rates >= 1e7 " +
    "render as 1.9E7)") {
    assert(Bench.parsePriorFlagship(
      body(""""flagship_ref":1.9E7"""), sf) == 1.9e7)
  }

  test("parsePriorFlagship degrades to 0 on sf mismatch") {
    assert(Bench.parsePriorFlagship(
      body(""""flagship_ref":523452"""), "/other/sf") == 0.0)
  }

  // ---- nextQueryRef (monotone min — VERDICT r12 #1) -----------------------

  test("an inflated row cannot overwrite its committed reference") {
    // contended sweep: min 5.415 vs committed 0.422 — ref must hold
    assert(Bench.nextQueryRef(Some(0.422), None, 5.415) == 0.422)
  }

  test("the isolated re-run heals the reference even when the sweep min " +
    "stayed inflated") {
    // sweep never caught a clean sample but the post-sweep isolated rep
    // did — the ref takes the best evidence available this round
    assert(Bench.nextQueryRef(Some(0.6), Some(0.519), 5.415) == 0.519)
  }

  test("a genuinely faster run lowers the bar; first runs seed it") {
    assert(Bench.nextQueryRef(Some(0.422), None, 0.37) == 0.37)
    assert(Bench.nextQueryRef(None, None, 1.2) == 1.2)
  }

  test("a poisoned (pre-r13) upward reference self-repairs on the first " +
    "clean run") {
    // the exact r12 near-miss: 5.415 committed as the ref, true steady
    // state 0.454 — min() restores the honest threshold immediately
    assert(Bench.nextQueryRef(Some(5.415), None, 0.454) == 0.454)
  }

  // ---- nextFlagshipRef (upward-only, clean-run-only, 2x cap) --------------

  test("flagship ref rises on a clean faster run and holds on a slower one") {
    assert(Bench.nextFlagshipRef(500000, 523452, failed = false,
      inflated = false) == 523452.0)
    assert(Bench.nextFlagshipRef(523452, 467296, failed = false,
      inflated = false) == 523452.0)
  }

  test("a failed or inflated flagship pass cannot move the anchor") {
    assert(Bench.nextFlagshipRef(523452, 0.0, failed = true,
      inflated = false) == 523452.0)
    assert(Bench.nextFlagshipRef(523452, 900000, failed = false,
      inflated = true) == 523452.0)
  }

  test("an anomalous fast outlier above 2x prior is rejected (ADVICE r12)") {
    assert(Bench.nextFlagshipRef(500000, 1100000, failed = false,
      inflated = false) == 500000.0)
    // exactly-2x is still accepted — the cap rejects only implausible jumps
    assert(Bench.nextFlagshipRef(500000, 1000000, failed = false,
      inflated = false) == 1000000.0)
  }

  test("the first clean run seeds the anchor (no prior)") {
    assert(Bench.nextFlagshipRef(0.0, 434047, failed = false,
      inflated = false) == 434047.0)
  }
}
