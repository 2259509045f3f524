package graft.metrics

import graft.compile.GraphCodec
import graft.ir.PipelineGraph
import org.apache.spark.sql.SparkSession

/** stats.pb parity (SURVEY §1.3): a snapshot = pipeline graph + per-node
  * counters + machine info, persisted as parquet/JSON and reloadable for
  * offline analysis — the workflow the reference uses for TF1 pipelines
  * that can't be resumed (README.md:497-504: trace → analyze offline →
  * print recommended parameters).
  */
object MetricsSnapshot {

  final case class Snapshot(
      graph: PipelineGraph,
      metrics: Seq[NodeMetrics],
      global: GlobalMetrics,
      rowCount: Long)

  def capture(spark: SparkSession, g: PipelineGraph, sfDir: String): Snapshot = {
    val run = Instrument.run(spark, g, sfDir)
    Snapshot(g, run.nodeMetrics, run.global, run.rowCount)
  }

  def save(spark: SparkSession, s: Snapshot, dir: String): Unit = {
    import spark.implicits._
    GraphCodec.save(spark, s.graph, s"$dir/graph")
    s.metrics.toDS().coalesce(1).write.mode("overwrite").parquet(s"$dir/node_metrics")
    Seq((s.global, s.rowCount)).toDF("global", "rowCount")
      .coalesce(1).write.mode("overwrite").json(s"$dir/global")
  }

  def load(spark: SparkSession, dir: String): Snapshot = {
    import spark.implicits._
    val graph = GraphCodec.load(spark, s"$dir/graph")
    val metrics = spark.read.parquet(s"$dir/node_metrics").as[NodeMetrics]
      .collect().sortBy(_.nodeId).toSeq
    val row = spark.read.json(s"$dir/global").head()
    val g = row.getStruct(row.fieldIndex("global"))
    val global = GlobalMetrics(
      cores = g.getLong(g.fieldIndex("cores")).toInt,
      memoryTotalBytes = g.getLong(g.fieldIndex("memoryTotalBytes")),
      memoryFreeBytes = g.getLong(g.fieldIndex("memoryFreeBytes")),
      wallclockNs = g.getLong(g.fieldIndex("wallclockNs")),
      cpuTimeNs = g.getLong(g.fieldIndex("cpuTimeNs")),
      diskBandwidthBps = g.getDouble(g.fieldIndex("diskBandwidthBps")),
      // absent in snapshots written before the fields existed → unmeasured
      peakMemoryBytes =
        if (g.schema.fieldNames.contains("peakMemoryBytes"))
          g.getLong(g.fieldIndex("peakMemoryBytes"))
        else -1L,
      machineCpuTimeNs =
        if (g.schema.fieldNames.contains("machineCpuTimeNs"))
          g.getLong(g.fieldIndex("machineCpuTimeNs"))
        else -1L)
    Snapshot(graph, metrics, global, row.getLong(row.fieldIndex("rowCount")))
  }

  /** Offline analysis over a reloaded snapshot. */
  def recommendation(s: Snapshot): graft.api.Recommendation =
    graft.api.Recommendation(s.graph, s.metrics, s.global, s.rowCount)
}
