package graft.plans

import graft.ir.PipelineOp._
import graft.ir.{PipelineGraph, PipelineNode}
import graft.metrics.{GlobalMetrics, NodeMetrics}
import org.scalatest.funsuite.AnyFunSuite

class AnalysisSpec extends AnyFunSuite {

  private val g = GlobalMetrics(
    cores = 8, memoryTotalBytes = 32L << 30, memoryFreeBytes = 16L << 30,
    wallclockNs = 10_000_000_000L, cpuTimeNs = 40_000_000_000L,
    diskBandwidthBps = 100e6)

  private def nm(id: Int, name: String, produced: Long, timeNs: Long,
      par: Int = 1, parallelizable: Boolean = true): NodeMetrics =
    NodeMetrics(id, name, name, par, produced, produced, timeNs, 0.0,
      parallelizable, isSource = id == 0, isRandom = false)

  // fixture rates (elements/s of per-core work): scan 50k, map 3.3k
  // (bottleneck), batch 78k
  private val fixture = Seq(
    nm(0, "Scan_0", 100000, 2_000_000_000L),
    nm(1, "MapE_0", 100000, 30_000_000_000L),
    nm(2, "Batch_0", 780, 10_000_000L))

  test("ranked table: bottleneck ranks first, derived columns correct") {
    val spark = graft.SparkTestSession.spark
    val df = Analysis.rankedTable(spark, fixture, g)
    val rows = df.collect()
    assert(rows.head.getAs[Int]("nodeId") == 1) // slowest expected rate first
    val r1 = rows.find(_.getAs[Int]("nodeId") == 1).get
    // per-core rate = 100000 / 30 s = 3333.3; parallel = ×min(1, 8)
    assert(math.abs(r1.getAs[Double]("expected_per_core_max_rate") - 3333.33) < 1.0)
    assert(math.abs(r1.getAs[Double]("expected_parallel_max_rate") - 3333.33) < 1.0)
    assert(math.abs(r1.getAs[Double]("p_busy") - 0.75) < 1e-9)
    val r0 = rows.find(_.getAs[Int]("nodeId") == 0).get
    assert(math.abs(r0.getAs[Double]("observed_rate") - 10000.0) < 1e-6)
  }

  test("bottleneck selection skips ignored and non-parallelizable nodes") {
    assert(Analysis.bottleneck(fixture, g).map(_.nodeId).contains(1))
    assert(Analysis.bottleneck(fixture, g, ignore = Set(1)).map(_.nodeId).contains(0))
    val seq = fixture.map(m => m.copy(isParallelizable = m.nodeId == 2))
    assert(Analysis.bottleneck(seq, g).map(_.nodeId).contains(2))
  }

  test("cache candidate: topologically-highest safe fit under 0.9·memory") {
    val graph = PipelineGraph(
      Seq(
        PipelineNode(0, Scan("lineitem")),
        PipelineNode(1, MapE(Seq("a")), Seq(0)),
        PipelineNode(2, MapE(Seq("b"), random = true), Seq(1)),
        PipelineNode(3, MapE(Seq("c")), Seq(2))),
      sink = 3)
    val mem = 10L << 30
    // node 3 fits but is random-tainted; node 1 fits → pick 1 (highest safe)
    val sizes = Map(0 -> (1L << 30), 1 -> (2L << 30), 3 -> (1L << 30))
    assert(Analysis.cacheCandidate(graph, sizes, mem).contains(1))
    // nothing fits → None
    assert(Analysis.cacheCandidate(graph, Map(1 -> (20L << 30)), mem).isEmpty)
    // sink is never a candidate
    assert(!Analysis.cacheCandidate(graph, Map(3 -> 100L), mem).contains(3))
  }

  test("cycle detector fires only on 5 flat same-node steps (graph_rewrites.py:170-198)") {
    import Analysis.Step
    val flat = (1 to 6).map(i => Step(7, 100.0 * (1 + 0.001 * i)))
    assert(Analysis.detectCycle(flat).contains(7))
    val improving = (1 to 6).map(i => Step(7, 100.0 * math.pow(1.2, i)))
    assert(Analysis.detectCycle(improving).isEmpty)
    val mixedNodes = flat.zipWithIndex.map { case (s, i) => s.copy(nodeId = i % 2) }
    assert(Analysis.detectCycle(mixedNodes).isEmpty)
    assert(Analysis.detectCycle(flat.take(4)).isEmpty) // not enough history
  }

  test("roofline: N=W/T, R=W/C, prefetch delta = ceil(N*-N)") {
    val r = Analysis.roofline(
      totalWorkNs = 80e9, wallclockNs = 10e9, completions = 1000,
      minLatencyNs = 400e6)
    assert(math.abs(r.n - 8.0) < 1e-9)
    assert(math.abs(r.r - 80e6) < 1e-3)
    assert(math.abs(r.nStar - 5.0) < 1e-9)
    assert(r.prefetchDelta == 0) // already above N*
    val starved = Analysis.roofline(8e9, 10e9, 1000, 400e6)
    assert(starved.prefetchDelta == math.ceil(50.0 - 0.8).toInt)
  }

  test("subsampling-error simulation: exact at full sample, tighter with more samples") {
    // simulation.py:12-75 — extrapolation error of size estimates made
    // from n-row subsamples (feeds A21 working-set planning).
    import graft.SparkTestSession.{sf, spark}
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "octet_length(text) as sz")
    val n = docs.count().toInt
    val full = Analysis.simulateSubsampling(docs, "sz", "doc_id", n, numTrials = 3)
    assert(full.size == 3 && full.forall(e => math.abs(e) < 1e-6)) // exact
    val small = Analysis.simulateSubsampling(docs, "sz", "doc_id", 10, 20, seed = 7)
    val big = Analysis.simulateSubsampling(docs, "sz", "doc_id", n / 2, 20, seed = 7)
    assert(small.size == 20 && big.size == 20)
    def rmse(xs: Seq[Double]) = math.sqrt(xs.map(x => x * x).sum / xs.size)
    assert(rmse(big) < rmse(small)) // more samples → tighter estimate
    // deterministic under a fixed seed
    assert(Analysis.simulateSubsampling(docs, "sz", "doc_id", 10, 5, seed = 9) ==
      Analysis.simulateSubsampling(docs, "sz", "doc_id", 10, 5, seed = 9))
  }

  test("disk upper bound scales with bandwidth") {
    assert(Analysis.diskUpperBound(100e6, 1e4) == 1e4.toDouble * 0 + 10000.0)
    assert(Analysis.diskUpperBound(100e6, 0.0).isPosInfinity)
  }
}
