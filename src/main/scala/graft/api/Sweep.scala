package graft.api

import graft.bench.{AutotuneState, Harness}
import graft.ir.{PipelineGraph, PipelineOp}
import graft.rules.Rules
import org.apache.spark.sql.SparkSession

/** The reference's multi-arm experiment sweep in one call
  * (train_sweep.sh:24-160): benchmark the SAME pipeline under every
  * tuning arm and emit the per-arm rate table its plots are scraped from
  * (plot_stats.py:52-70 reads one "mean minibatch rate" per arm log).
  *
  * Arm roster and the reference function each mirrors:
  *   - `naive`            — as-authored graph (run_baseline: parallelism 1)
  *   - `heuristic`        — every parallelizable op pinned to the core
  *                          count (step_heuristic: parallelism=16)
  *   - `plumber_rewrites` — the incremental ranked rewriter, numSteps
  *                          steps (run_plumber_rewrites → graph_rewrites)
  *   - `random_rewrites_i`— random_valid rewriter arms, k seeds
  *                          (run_random_rewrites, random_i loop)
  *   - `plumber_opt`      — one-shot LP optimize of the whole pipeline
  *                          (step_plumber_opt: PLUMBER_OPTIMIZE_PIPELINE)
  *
  * The reference's `autotune` arm (parallelism=-1) delegates to tf.data's
  * internal tuner; its Spark analogue — AQE picking widths at runtime —
  * is on in every arm here, so it has no separate row (SURVEY §2.a
  * row 28 treats determinism/threadpool options as session conf).
  */
object Sweep {

  final case class ArmResult(
      arm: String,
      steps: Int,
      finalRate: Double, // last benchmark of the arm (what a user ships)
      bestRate: Double,  // best configuration the arm found along the way
      meanRate: Double)

  final case class Config(
      numSteps: Int = 3,
      randomArms: Int = 2,
      benchIterations: Int = 2,
      outDir: Option[String] = None)

  def run(spark: SparkSession, g0: PipelineGraph, sfDir: String,
      cfg: Config = Config()): Seq[ArmResult] = {
    val cores = spark.sparkContext.defaultParallelism

    def bench(g: PipelineGraph): Harness.BenchResult =
      Harness.benchmark(spark, g, sfDir, cfg.benchIterations,
        new AutotuneState(minRuntimeSec = 0.0))

    def ofBench(arm: String, b: Harness.BenchResult): ArmResult = {
      val rates = if (b.iterationRates.nonEmpty) b.iterationRates else Seq(b.elementRate)
      ArmResult(arm, 1, b.elementRate, rates.max, rates.sum / rates.size)
    }

    def ofSteps(arm: String, steps: Seq[Rewriter.StepResult]): ArmResult = {
      val fwd = steps.filter(_.deviation == 0).map(_.rate)
      ArmResult(arm, fwd.size, fwd.last, fwd.max, fwd.sum / fwd.size)
    }

    val naive = ofBench("naive", bench(g0))

    val heuristicG = g0.nodes
      .filter(n => PipelineOp.supportsParallelism(n.op))
      .foldLeft(g0)((g, n) => Rules.SetParallelism(n.id, cores).rewrite(g))
    val heuristic = ofBench("heuristic", bench(heuristicG))

    val (_, plumberSteps) = Rewriter.run(spark, g0, sfDir,
      Rewriter.Config(numSteps = cfg.numSteps, strategy = Rewriter.RankedTop,
        benchIterations = cfg.benchIterations,
        outDir = cfg.outDir.map(_ + "/plumber_rewrites")))
    val plumber = ofSteps("plumber_rewrites", plumberSteps)

    val randoms = (0 until cfg.randomArms).map { i =>
      val (_, steps) = Rewriter.run(spark, g0, sfDir,
        Rewriter.Config(numSteps = cfg.numSteps,
          strategy = Rewriter.RandomValid(seed = 100L + i),
          benchIterations = cfg.benchIterations,
          outDir = cfg.outDir.map(_ + s"/random_rewrites_$i")))
      ofSteps(s"random_rewrites_$i", steps)
    }

    val optimized = Optimizer.optimizePipeline(spark, g0, sfDir).optimized
    val plumberOpt = ofBench("plumber_opt", bench(optimized))

    val results = Seq(naive, heuristic, plumber) ++ randoms :+ plumberOpt
    cfg.outDir.foreach { dir =>
      val d = new java.io.File(dir); d.mkdirs()
      val w = new java.io.PrintWriter(new java.io.File(d, "sweep_stats.csv"))
      try {
        w.println("arm,steps,final_rate,best_rate,mean_rate")
        results.foreach(r =>
          w.println(s"${r.arm},${r.steps},${r.finalRate},${r.bestRate},${r.meanRate}"))
      } finally w.close()
      // the per-arm comparison figure the reference scrapes its logs for
      graft.tools.Plots.barsSvg(
        new java.io.File(d, "sweep_stats.svg").getPath,
        results.map(r => r.arm -> r.bestRate))
    }
    results
  }
}
