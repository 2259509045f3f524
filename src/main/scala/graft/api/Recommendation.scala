package graft.api

import graft.ir.PipelineGraph
import graft.metrics.{GlobalMetrics, NodeMetrics}
import graft.plans.Analysis
import graft.solver.MaxMinThroughputLP
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §3.3 interactive-introspection surface — the reference's
  * `PlumberPerformanceModel(...).model()` / `.recommendation()` API shape
  * (notebook/Example.ipynb; graph_rewrites.py:466-535), so code written
  * against the reference's method names ports one-to-one:
  *
  *   model.recommendation().bottleneck_node()  →  rec.bottleneckNode()
  *   model.CPU_Util() / Disk_Util()            →  rec.cpuUtil / diskUtil
  *   recommendation.upper_bounds()             →  rec.upperBounds()
  *   recommendation.LP_upper_bounds()          →  rec.lpUpperBounds()
  *   recommendation.disk_upper_bounds(bw)      →  rec.diskUpperBounds(bw)
  *   model.to_graphviz("stats.dot")            →  rec.toGraphviz(path)
  */
final case class Recommendation(
    graph: PipelineGraph,
    metrics: Seq[NodeMetrics],
    global: GlobalMetrics,
    rowCount: Long) {

  /** bottleneck_node(mode): ranked top valid node. */
  def bottleneckNode(ignore: Set[Int] = Set.empty): Option[Int] =
    Analysis.bottleneck(metrics, global, ignore).map(_.nodeId)

  /** ranked_list_bottleneck_nodes_analysis(extended=True). */
  def rankedListBottleneckNodesAnalysis(spark: SparkSession): DataFrame =
    Analysis.rankedTable(spark, metrics, global)

  /** upper_bounds(keep_p_busy): per-node expected parallel max rates. */
  def upperBounds(keepPBusy: Boolean = false): Map[Int, Double] =
    metrics.map { m =>
      val r = Analysis.expectedParallelMaxRate(m, global)
      m.nodeId -> (if (keepPBusy) r * math.max(1e-9, pBusy(m)) else r)
    }.toMap

  /** LP_upper_bounds(naive, use_existing_usage): max-min achievable rate.
    * naive skips the sequential-op θmax=1 clamp; useExistingUsage floors
    * every θ at the node's current allocation (convex_solver.py:55-75,
    * the 4th LP variant get_runtime_data reports,
    * graph_rewrites.py:466-535).
    */
  def lpUpperBounds(naive: Boolean = false, useExistingUsage: Boolean = false,
      bandwidth: Option[MaxMinThroughputLP.Bandwidth] = None): Double = {
    val ops = metrics.filter(_.elementsProduced > 0).map { m =>
      MaxMinThroughputLP.OpRate(
        m.nodeId,
        Analysis.expectedPerCoreMaxRate(m) match {
          case r if r.isFinite => r; case _ => 1e12
        },
        thetaMax =
          if (naive || m.isParallelizable) global.cores.toDouble else 1.0,
        existing = m.parallelism.toDouble)
    }
    if (ops.isEmpty) 0.0
    else MaxMinThroughputLP.solve(ops, global.cores.toDouble,
      useExistingUsage = useExistingUsage, bandwidth = bandwidth).rate
  }

  /** disk_upper_bounds(bandwidth): element-rate ceiling from disk. */
  def diskUpperBounds(bandwidthBps: Double = global.diskBandwidthBps): Double =
    Analysis.diskUpperBound(bandwidthBps, diskBytesPerRootElement)

  /** disk_bytes_per_root_element(): measured source bytes per output row. */
  def diskBytesPerRootElement: Double = {
    val srcBytes = metrics.filter(_.isSource)
      .map(m => m.bytesPerElement * m.elementsProduced).sum
    if (rowCount > 0) srcBytes / rowCount else 0.0
  }

  /** remaining_CPU_cores(). */
  def remainingCpuCores: Double =
    math.max(0.0, global.cores - global.cpuTimeNs.toDouble / math.max(1L, global.wallclockNs))

  /** actual_rate(): observed sink rate. */
  def actualRate: Double = rowCount / math.max(1e-9, global.wallclockNs / 1e9)

  /** min_latency(): mean per-element service time across the pipeline. */
  def minLatencySec: Double = {
    val work = metrics.map(_.processingTimeNs).sum
    if (rowCount > 0) work / 1e9 / rowCount else 0.0
  }

  /** iterator_wallclock_duration(). */
  def iteratorWallclockSec: Double = global.wallclockNs / 1e9

  /** CPU_Util(): process CPU over wall × cores. */
  def cpuUtil: Double =
    global.cpuTimeNs.toDouble / math.max(1L, global.wallclockNs) / global.cores

  /** Disk_Util(): observed source read rate over measured bandwidth. */
  def diskUtil: Double = {
    val srcBytes = metrics.filter(_.isSource)
      .map(m => m.bytesPerElement * m.elementsProduced).sum
    val rate = srcBytes / math.max(1e-9, global.wallclockNs / 1e9)
    if (global.diskBandwidthBps > 0) rate / global.diskBandwidthBps else 0.0
  }

  def memoryFree: Long = global.memoryFreeBytes
  def memoryTotal: Long = global.memoryTotalBytes
  def totalCpuTimeSec: Double = global.cpuTimeNs / 1e9
  def totalWallclockTimeSec: Double = global.wallclockNs / 1e9

  /** to_graphviz(path): DOT with the bottleneck highlighted. */
  def toGraphviz(path: String): Unit = {
    val hot = bottleneckNode()
    val dot = graph.toDot(extraAttrs = id =>
      if (hot.contains(id)) "style=filled, fillcolor=\"#ffcccc\", color=red" else "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), dot)
  }

  private def pBusy(m: NodeMetrics): Double =
    if (global.cpuTimeNs > 0) m.processingTimeNs.toDouble / global.cpuTimeNs else 0.0
}

object Recommendation {
  /** Trace a pipeline and build its recommendation — the
    * `PlumberPerformanceModel(stats.pb).model().recommendation()` path.
    */
  def trace(spark: SparkSession, g: PipelineGraph, sfDir: String): Recommendation = {
    val run = graft.metrics.Instrument.run(spark, g, sfDir)
    Recommendation(g, run.nodeMetrics, run.global, run.rowCount)
  }
}
