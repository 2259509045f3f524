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

  // ---- refsCompatible (methodology gate — r16 count()→noop migration) -----

  test("a count-era bench_out.json contributes no references; the noop " +
    "methodology marker restores them") {
    // r16 changed the timed action from .count() (Catalyst prunes the
    // work the row count doesn't need) to full noop materialization —
    // strictly more work for the pruned class, so count-era minima must
    // not become noop-era regression thresholds
    assert(!Bench.refsCompatible(body(""""queries_ref":{"a":0.4}""")))
    val current = body(""""methodology":"noop","queries_ref":{"a":0.4}""")
    assert(Bench.refsCompatible(current))
    assert(Bench.parsePriorMin(current, sf) == Map("a" -> 0.4))
    // a future methodology bump invalidates noop files the same way
    assert(!Bench.refsCompatible(body(""""methodology":"count"""")))
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

  // ---- inflationThreshold (1.5x + flat 0.5 s slack — VERDICT r14 #1) ------

  test("every row gets a 0.5 s absolute slack on top of the 1.5x ratio") {
    // the r14 false alarm: dd22 min 2.635 vs ref 1.625 — 1.62x, but only
    // +1.01 s absolute; with slack the threshold is 2.9375 so it passes
    assert(Bench.inflationThreshold(1.625) == 1.5 * 1.625 + 0.5)
    assert(2.635 <= Bench.inflationThreshold(1.625))
    // a genuinely contended sample still trips it (ss25: 3.633 vs 1.103)
    assert(3.633 > Bench.inflationThreshold(1.103))
    // a real 1.6x regression on a long row is still flagged — the flat
    // slack is proportionally negligible there
    assert(8.0 > Bench.inflationThreshold(4.9))
  }

  test("the threshold is MONOTONE in the reference (no step at 2 s)") {
    // a gated short-row slack would give a SLOWER ref a STRICTER
    // absolute bar around the boundary (threshold(1.99) > threshold(2.01)
    // under the stepped form) — a ref drifting across 2 s between rounds
    // would abruptly lose its slack and latch a phantom regression
    assert(Bench.inflationThreshold(1.99) < Bench.inflationThreshold(2.01))
    val refs = Seq(0.1, 0.5, 1.0, 1.99, 2.0, 2.01, 3.0, 10.0)
    assert(refs.map(Bench.inflationThreshold) == refs.map(Bench.inflationThreshold).sorted)
  }

  // ---- adjudicateInflated (isolated re-run clears the flag) ---------------

  test("an isolated re-measure inside the threshold clears the published " +
    "flag (the r14 dd22/ss25 case)") {
    // ss25: sweep min 3.633 latched, isolated 1.268 vs ref 1.103 — the
    // adjudication the judge previously did by hand now clears the row
    assert(!Bench.adjudicateInflated(1.103, Some(1.268)))
    assert(!Bench.adjudicateInflated(1.625, Some(1.873)))
  }

  test("a real regression survives adjudication; no isolated evidence " +
    "keeps the flag") {
    // isolated min still over threshold => genuinely slow
    assert(Bench.adjudicateInflated(1.0, Some(2.5)))
    assert(Bench.adjudicateInflated(4.0, Some(7.0)))
    // all isolated reps failed => no clean evidence, stay flagged
    assert(Bench.adjudicateInflated(1.0, None))
  }

  // ---- familyDrift (aggregate short-row guard — VERDICT r15 #2) -----------

  test("uniform short-row drift past 1.3x of the family's reference mass " +
    "latches the drift flag") {
    // 25 rows, each ref 0.5 s, each drifted to 0.7 s (+0.4 s aggregate
    // window per row is exactly what the per-row 0.5 s slack waves past)
    val rows = Seq.fill(25)((0.7, 0.5))
    assert(Bench.familyDrift(rows))
    // the same family at its reference mass stays quiet
    assert(!Bench.familyDrift(Seq.fill(25)((0.5, 0.5))))
    // 1.2x aggregate is inside the bar — run-to-run spread, not drift
    assert(!Bench.familyDrift(Seq.fill(25)((0.6, 0.5))))
  }

  test("drift needs >= 20 family rows — a couple of contended short rows " +
    "cannot latch it") {
    val rows = Seq.fill(19)((0.9, 0.5))
    assert(!Bench.familyDrift(rows))
    assert(Bench.familyDrift(rows :+ ((0.9, 0.5))))
  }

  test("drift ignores rows outside the [0.1, 2) s reference family") {
    // long rows (per-row ratio test already has teeth) and trivial rows
    // (scheduler jitter) must not enter the aggregate in either direction
    val longRows = Seq.fill(30)((6.0, 4.0))   // 1.5x but ref >= 2
    val tinyRows = Seq.fill(30)((0.09, 0.05)) // 1.8x but ref < 0.1
    assert(!Bench.familyDrift(longRows))
    assert(!Bench.familyDrift(tinyRows))
    // and a drifting short family still latches with quiet long rows mixed in
    assert(Bench.familyDrift(Seq.fill(25)((0.7, 0.5)) ++ longRows.map {
      case (_, r) => (r, r)
    }))
  }

  test("drift degrades safely on empty and zero-reference input") {
    assert(!Bench.familyDrift(Seq.empty))
    assert(!Bench.familyDrift(Seq.fill(25)((0.5, 0.0))))
  }

  // ---- drift self-adjudication (VERDICT r16 #2) ---------------------------

  test("driftSample picks the n most-drifted short-family rows, " +
    "deterministically (ratio desc, name tie-break), family-gated") {
    val rows = Seq(
      ("a_mild", 0.6, 0.5), // 1.2x
      ("b_hot", 1.5, 0.5), // 3.0x
      ("c_hot", 0.9, 0.3), // 3.0x — ties with b_hot, name breaks it
      ("d_long", 9.0, 3.0), // outside the family (ref >= 2)
      ("e_tiny", 0.9, 0.05), // outside the family (ref < 0.1)
      ("f_warm", 1.0, 0.5)) // 2.0x
    assert(Bench.driftSample(rows, n = 3) == Seq("b_hot", "c_hot", "f_warm"))
    // n larger than the family returns the whole family, still ranked
    assert(Bench.driftSample(rows, n = 10) ==
      Seq("b_hot", "c_hot", "f_warm", "a_mild"))
  }

  test("driftVerdict replays the r16 scenario as contention: uniform sweep " +
    "inflation whose isolated re-runs sit at the reference") {
    // sweep latched drift at ~1.31x; the isolated sample re-measures at
    // ~1.0x of the refs — busy box, not a regression
    val sample = Seq.fill(10)((0.52, 0.5))
    assert(Bench.driftVerdict(sample) == "contention")
  }

  test("driftVerdict calls a regression only when the drift SURVIVES " +
    "isolation (same 1.3x bar as the family guard)") {
    assert(Bench.driftVerdict(Seq.fill(10)((0.7, 0.5))) == "regression")
    // exactly at the bar is NOT a regression (strict >, like familyDrift;
    // single pair so the ratio is an exact division, not a summed float)
    assert(Bench.driftVerdict(Seq((1.3, 1.0))) == "contention")
  }

  test("driftVerdict: no isolated evidence must not read as exoneration") {
    assert(Bench.driftVerdict(Seq.empty) == "regression")
    assert(Bench.driftVerdict(Seq((0.5, 0.0))) == "regression")
  }

  test("driftClearedCount publishes the per-row evidence behind a mixed " +
    "verdict: one heavy row can push the sum-ratio over the bar while " +
    "every row clears its own threshold (r18's drifted run)") {
    // nine light rows near their refs + one heavy row at 1.74x its ref:
    // sum ratio 5.47/4.13 = 1.32 > 1.3 -> regression, yet each row sits
    // under inflationThreshold(ref) = 1.5*ref + 0.5 -> cleared = 10
    val sample = Seq.fill(9)((0.396, 0.337)) :+ (1.901, 1.094)
    assert(Bench.driftVerdict(sample) == "regression")
    assert(Bench.driftClearedCount(sample) == 10)
    // a genuinely regressed row is NOT counted as cleared
    assert(Bench.driftClearedCount(Seq((2.2, 1.094), (0.3, 0.3))) == 1)
    assert(Bench.driftClearedCount(Seq.empty) == 0)
    // exactly at the threshold clears (<=, matching adjudicateInflated's
    // strict > for staying flagged)
    assert(Bench.driftClearedCount(Seq((2.0, 1.0))) == 1)
  }

  // ---- driftDivisor (drift-normalized PERF survival — VERDICT r18 #2) -----

  test("driftDivisor is the median iso/ref ratio of the adjudication " +
    "sample — the box-speed multiplier a comparison divides out") {
    // r18's scenario: untouched rows isolated at ~1.45x their refs
    val sample = Seq((0.725, 0.5), (1.45, 1.0), (0.29, 0.2))
    assert(math.abs(Bench.driftDivisor(sample) - 1.45) < 1e-9)
    // even count: mean of the middle two
    assert(math.abs(Bench.driftDivisor(
      Seq((1.2, 1.0), (1.4, 1.0), (1.6, 1.0), (1.8, 1.0))) - 1.5) < 1e-9)
  }

  test("driftDivisor's median resists one genuinely regressed row in a " +
    "mostly-untouched sample (the most-drifted-first selection bias)") {
    val sample = Seq((5.0, 1.0)) ++ Seq.fill(8)((1.4, 1.0))
    assert(math.abs(Bench.driftDivisor(sample) - 1.4) < 1e-9)
  }

  test("driftDivisor degrades to a safe 1.0 with no evidence, and skips " +
    "zero references") {
    assert(Bench.driftDivisor(Seq.empty) == 1.0)
    assert(Bench.driftDivisor(Seq((0.5, 0.0))) == 1.0)
    // a FASTER box publishes a sub-1 divisor — normalization is two-sided
    assert(math.abs(Bench.driftDivisor(Seq((0.8, 1.0))) - 0.8) < 1e-9)
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
