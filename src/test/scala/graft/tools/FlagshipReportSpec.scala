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
    val e = FlagshipReport.gather(spark, sf, benchIterations = 2)
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
