package graft.metrics

import graft.SparkTestSession.{sf, spark}
import graft.api.Flagship
import org.scalatest.funsuite.AnyFunSuite

class PreciseProfilerSpec extends AnyFunSuite {

  test("precise profile: exact counts, monotone aggregates, self-time split") {
    val p = PreciseProfiler.run(spark, Flagship.graph, sf)
    val byId = p.timings.map(t => t.nodeId -> t).toMap
    // exact element counts at each boundary
    assert(byId(0).elements == 6000)
    assert(byId(2).elements < byId(1).elements) // filter drops rows
    // every boundary measured (prefixes run independently, so strict
    // monotonicity across runs is not guaranteed — self-time clamps at 0)
    assert(p.timings.forall(_.aggregatePullNs > 0))
    // self = aggregate − inputs (non-negative by construction)
    p.timings.foreach(t => assert(t.selfNs >= 0))
    val g = Flagship.graph
    p.timings.foreach { t =>
      val inputsAgg = g.byId(t.nodeId).inputs
        .map(i => byId(i).aggregatePullNs).sum
      assert(t.selfNs == math.max(0L, t.aggregatePullNs - inputsAgg))
    }
    // converts into NodeMetrics consumable by the ranked table / LP
    val ms = PreciseProfiler.toNodeMetrics(g, p)
    assert(ms.size == g.nodes.size)
    val ranked = graft.plans.Analysis.rankedTable(spark, ms,
      GlobalMetrics(4, 1L << 33, 1L << 32, p.wallNs, p.timings.map(_.selfNs).sum, 100e6))
    assert(ranked.count() == g.nodes.size)
    // precise mode differentiates nodes inside one WSCG stage: the rate
    // values are not all identical (unlike proportional attribution)
    val rates = ranked.select("expected_parallel_max_rate").collect().map(_.getDouble(0))
    assert(rates.distinct.length > 1)
  }
}
