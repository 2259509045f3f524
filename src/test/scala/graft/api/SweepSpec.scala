package graft.api

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

class SweepSpec extends AnyFunSuite {

  test("one-call sweep runs all arms and emits the comparison table") {
    val out = java.nio.file.Files.createTempDirectory("graft-sweep").toString
    val results = Sweep.run(spark, Flagship.graph, sf,
      Sweep.Config(numSteps = 2, randomArms = 2, benchIterations = 1,
        outDir = Some(out)))

    // full train_sweep.sh roster: naive, heuristic, plumber, random x2,
    // one-shot plumber_opt — 6 arms, all with real measurements
    assert(results.size == 6)
    val byArm = results.map(r => r.arm -> r).toMap
    assert(byArm.keySet == Set("naive", "heuristic", "plumber_rewrites",
      "random_rewrites_0", "random_rewrites_1", "plumber_opt"))
    assert(results.forall(r => r.finalRate > 0 && r.bestRate >= r.finalRate * 0.999))

    // the plumber arm explores numSteps configs; its best must not lose
    // to the naive arm's average — the paper's headline claim, and the
    // sweep's own sanity gate (train_sweep exists to show this table)
    assert(byArm("plumber_rewrites").bestRate >= byArm("naive").meanRate,
      s"plumber ${byArm("plumber_rewrites")} vs naive ${byArm("naive")}")

    // comparison table on disk, one row per arm, scrapeable shape
    val lines = scala.io.Source.fromFile(new java.io.File(out, "sweep_stats.csv"))
      .getLines().toSeq
    assert(lines.head == "arm,steps,final_rate,best_rate,mean_rate")
    assert(lines.size == 7)
    // per-arm rewriter artifacts (benchmark_stats.csv per rewriter arm)
    assert(new java.io.File(out, "plumber_rewrites/benchmark_stats.csv").exists())
    assert(new java.io.File(out, "random_rewrites_0/benchmark_stats.csv").exists())
    // comparison figure (SVG twin of the reference's scraped plot)
    assert(new java.io.File(out, "sweep_stats.svg").exists())
  }

  test("forward trajectory is invariant to numDeviations (per-arm RNG)") {
    // deviation arms must not consume draws from the forward arm's stream
    val a = Rewriter.run(spark, Flagship.graph, sf,
      Rewriter.Config(numSteps = 2, strategy = Rewriter.RandomValid(7),
        benchIterations = 1, numDeviations = 1))._2
    val b = Rewriter.run(spark, Flagship.graph, sf,
      Rewriter.Config(numSteps = 2, strategy = Rewriter.RandomValid(7),
        benchIterations = 1, numDeviations = 3))._2
    assert(a.filter(_.deviation == 0).map(_.chosenNode) ==
      b.filter(_.deviation == 0).map(_.chosenNode))
  }
}
