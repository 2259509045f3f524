package graft.tools

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the predicted-vs-observed optimizer contract (VERDICT r17 #3):
  * the committed FLAGSHIP.md states the band; this spec latches it so a
  * prediction-quality regression (unit mistake, rate inversion, broken
  * theta application — all of which read as 10-1000x gaps) fails the
  * build rather than silently shipping a model that no longer predicts.
  */
class FlagshipReportSpec extends AnyFunSuite {

  test("the LP's binding-op prediction holds on an instrumented re-run " +
    "of the rewritten pipeline: observed/predicted within [0.25, 4], " +
    "and the rewrite never regresses the wall rate below 0.7x") {
    // The bands are TIMING bands over two in-test wall measurements; a
    // shared box swinging 1.5-1.8x intra-day (r19's documented drift)
    // can push one sample to ~0.62x and flake the suite while the same
    // measurement passes solo (observed twice). A violation must
    // REPRODUCE on one fresh gather before it fails the build — the
    // bands themselves are unchanged, so the regressions this spec
    // exists for (10-1000x prediction gaps, real rewrite slowdowns)
    // still fail, twice.
    def inBand(x: FlagshipReport.Evidence): Boolean =
      x.ratio >= 0.25 && x.ratio <= 4.0 && x.speedup >= 0.7
    val first = FlagshipReport.gather(spark, sf, benchIterations = 2)
    val e =
      if (inBand(first)) first
      else FlagshipReport.gather(spark, sf, benchIterations = 2)
    assert(e.predictedRate > 0, "LP must produce a positive rate")
    assert(e.bindingPredicted > 0 && e.bindingObserved > 0,
      s"degenerate binding-op rates: $e")
    assert(e.ratio >= 0.25 && e.ratio <= 4.0,
      f"observed/predicted ${e.ratio}%.3f left the stated band " +
        f"[0.25, 4] (predicted ${e.bindingPredicted}%.0f, " +
        f"observed ${e.bindingObserved}%.0f at ${e.bindingOp})")
    assert(e.speedup >= 0.7,
      f"rewritten pipeline regressed the wall rate: ${e.speedup}%.2fx")
    // the rendered artifact carries both headline numbers
    val md = FlagshipReport.render(e)
    assert(md.contains("Estimated_Max_Rate_Convex") &&
      md.contains("OBSERVED effective rate"))
  }
}
