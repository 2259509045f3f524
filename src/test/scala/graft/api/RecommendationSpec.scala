package graft.api

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

class RecommendationSpec extends AnyFunSuite {

  lazy val rec: Recommendation = Recommendation.trace(spark, Flagship.graph, sf)

  test("§3.3 introspection surface: bounds, utils, rates are coherent") {
    assert(rec.bottleneckNode().nonEmpty)
    assert(rec.rankedListBottleneckNodesAnalysis(spark).count() ==
      Flagship.graph.nodes.size)
    val ub = rec.upperBounds()
    assert(ub.size == Flagship.graph.nodes.size)
    assert(ub.values.forall(_ > 0))
    // keep_p_busy scales bounds down (p_busy ≤ 1 per node)
    val ubBusy = rec.upperBounds(keepPBusy = true)
    assert(ubBusy.forall { case (k, v) => v <= ub(k) + 1e-9 })
    // naive LP (no sequential clamp) can only raise the bound
    assert(rec.lpUpperBounds(naive = true) >= rec.lpUpperBounds() - 1e-9)
    assert(rec.cpuUtil >= 0 && rec.cpuUtil <= 1.5) // local mode headroom
    assert(rec.diskUtil >= 0)
    assert(rec.actualRate > 0)
    assert(rec.remainingCpuCores >= 0 && rec.remainingCpuCores <= rec.global.cores)
    assert(rec.totalWallclockTimeSec > 0)
    // disk bound uses measured bytes/root element
    assert(rec.diskBytesPerRootElement >= 0)
    assert(rec.diskUpperBounds(100e6) > 0)
  }

  test("to_graphviz writes a DOT file with the bottleneck highlighted") {
    val p = java.nio.file.Files.createTempDirectory("graft-rec").resolve("stats.dot")
    rec.toGraphviz(p.toString)
    val dot = java.nio.file.Files.readString(p)
    assert(dot.startsWith("digraph"))
    assert(dot.contains("fillcolor"))
  }
}
