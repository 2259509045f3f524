package graft.plans

import graft.ir.PipelineGraph
import graft.metrics.{GlobalMetrics, NodeMetrics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's core analytics over per-node metrics (SURVEY §2.c).
  * The metrics table is tiny (one row per operator) so several of these
  * are plain Scala; the ranked table is exposed as a DataFrame because it
  * IS the product — the ~40-column bottleneck table users query.
  */
object Analysis {

  /** A4 — ranked_nodes_to_df (graph_rewrites.py:333-441): per-node derived
    * rate model, ranked by expected parallel max rate (ascending — the
    * head row is THE bottleneck).
    */
  def rankedTable(spark: SparkSession, ms: Seq[NodeMetrics], g: GlobalMetrics): DataFrame = {
    import spark.implicits._
    val df = ms.toDS().toDF()
    val withRates = df
      .withColumn("processing_time_s", col("processingTimeNs") / 1e9)
      .withColumn(
        "expected_per_core_max_rate",
        when(col("processingTimeNs") > 0,
          col("elementsProduced") / (col("processingTimeNs") / 1e9) / col("parallelism"))
          .otherwise(lit(Double.PositiveInfinity)))
      .withColumn(
        "expected_parallel_max_rate",
        col("expected_per_core_max_rate") * least(col("parallelism"), lit(g.cores)))
      .withColumn("observed_rate",
        col("elementsProduced") / (lit(g.wallclockNs) / 1e9))
      .withColumn("element_ratio",
        when(col("elementsConsumed") > 0, col("elementsProduced") / col("elementsConsumed"))
          .otherwise(lit(1.0)))
      .withColumn("p_busy",
        when(lit(g.cpuTimeNs) > 0, col("processingTimeNs") / lit(g.cpuTimeNs.toDouble))
          .otherwise(lit(0.0)))
      .withColumn("num_cores_used",
        col("processingTimeNs") / lit(math.max(1L, g.wallclockNs).toDouble))
      // expected_autotune_latency_s = t/elems/parallelism*ratio/1e9
      // (graph_rewrites.py:434-441)
      .withColumn("expected_autotune_latency_s",
        when(col("elementsProduced") > 0,
          col("processingTimeNs") / col("elementsProduced") / col("parallelism")
            * col("element_ratio") / 1e9).otherwise(lit(0.0)))
    withRates.orderBy(col("expected_parallel_max_rate").asc_nulls_last, col("nodeId"))
  }

  /** Bottleneck pick (A6 default strategy): lowest expected parallel max
    * rate among parallelizable nodes not in `ignore`.
    */
  def bottleneck(ms: Seq[NodeMetrics], g: GlobalMetrics, ignore: Set[Int] = Set.empty): Option[NodeMetrics] =
    ms.filter(m => m.isParallelizable && !ignore.contains(m.nodeId) && m.elementsProduced > 0)
      .sortBy(m => expectedParallelMaxRate(m, g))
      .headOption

  def expectedPerCoreMaxRate(m: NodeMetrics): Double =
    if (m.processingTimeNs <= 0) Double.PositiveInfinity
    else m.elementsProduced / (m.processingTimeNs / 1e9) / m.parallelism

  def expectedParallelMaxRate(m: NodeMetrics, g: GlobalMetrics): Double =
    expectedPerCoreMaxRate(m) * math.min(m.parallelism, g.cores)

  /** A8 — cache-candidate selection (graph_rewrites.py:707-759,
    * pipeline_optimizer.py:1178-1218): nodes whose materialized size fits
    * in FRACTION_CACHEABLE_MEMORY×memory, not tainted by upstream
    * randomness; pick the topologically HIGHEST (closest to sink).
    */
  val FractionCacheableMemory = 0.9 // graph_rewrites.py:43

  def cacheCandidate(g: PipelineGraph, sizes: Map[Int, Long], memoryBytes: Long,
      excludeOps: Set[String] = Set("Take", "Skip", "ShuffleOp", "CacheOp")): Option[Int] = {
    val budget = (FractionCacheableMemory * memoryBytes).toLong
    val topoIdx = g.topoOrder.zipWithIndex.toMap
    g.nodes
      .filter { n =>
        sizes.get(n.id).exists(s => s > 0 && s <= budget) &&
          !g.randomTainted.contains(n.id) &&
          !excludeOps.contains(n.op.base) &&
          g.reachableFromSink.contains(n.id) && n.id != g.sink
      }
      .sortBy(n => -topoIdx(n.id))
      .headOption.map(_.id)
  }

  /** A7 — cycle/plateau detector (graph_rewrites.py:170-198): if the last
    * `window` rewrites all touched the same node and improvements are flat
    * (max < 1.10, avg ≤ 1.01), ignore that node from now on.
    */
  final case class Step(nodeId: Int, rate: Double)

  def detectCycle(history: Seq[Step], window: Int = 5): Option[Int] = {
    if (history.size < window + 1) return None
    val recent = history.takeRight(window)
    val sameNode = recent.map(_.nodeId).distinct.size == 1
    if (!sameNode) return None
    val prevRates = history.takeRight(window + 1).map(_.rate)
    val improvements = prevRates.sliding(2).map { case Seq(a, b) => b / math.max(a, 1e-12) }.toSeq
    if (improvements.max < 1.10 && improvements.sum / improvements.size <= 1.01)
      Some(recent.head.nodeId)
    else None
  }

  /** A12 — roofline/queueing stats (pipeline_optimizer.py:745-810):
    * N = W/T average jobs in system, R = W/C mean service time,
    * prefetch sizing = ceil(Nstar - N).
    */
  final case class Roofline(n: Double, r: Double, nStar: Double, prefetchDelta: Int)

  def roofline(totalWorkNs: Double, wallclockNs: Double, completions: Long,
      minLatencyNs: Double): Roofline = {
    val n = totalWorkNs / math.max(1.0, wallclockNs)
    val r = totalWorkNs / math.max(1L, completions).toDouble
    val nStar = if (r > 0) minLatencyNs / r else 0.0
    Roofline(n, r, nStar, math.max(0, math.ceil(nStar - n).toInt))
  }

  /** A13 — disk bound (pipeline_optimizer.py:1047-1100): max element rate
    * the measured disk bandwidth supports, and the interleave parallelism
    * scale-up when under-utilized.
    */
  def diskUpperBound(bandwidthBps: Double, bytesPerRootElement: Double): Double =
    if (bytesPerRootElement <= 0) Double.PositiveInfinity
    else bandwidthBps / bytesPerRootElement

  /** A21 companion — subsampling-error simulation (simulation.py:12-75):
    * per trial, draw `numSamples` rows without replacement, extrapolate
    * total size as sampleSum / fractionSeen, report totalSize − estimate.
    * Feeds cache/working-set planning: how wrong is a size estimate made
    * from an n-row subsample?
    *
    * Distributed shape: trials explode to (trial, row) and each trial is
    * its own window partition, so parallelism = numTrials and the
    * per-trial hash-rank sort never crosses partitions. (Exact-k sampling
    * sorts each trial's copy; at extreme row counts swap in
    * hash-threshold fraction sampling — this is the reference's
    * back-of-envelope tool, sized for metadata tables.)
    */
  def simulateSubsampling(df: DataFrame, sizeCol: String, idCol: String,
      numSamples: Int, numTrials: Int, seed: Long = 42L): Seq[Double] = {
    require(numSamples > 0 && numTrials > 0)
    val n = df.count()
    require(numSamples <= n, s"numSamples=$numSamples > rows=$n")
    val fractionSeen = numSamples.toDouble / n
    val totalSize = df.agg(sum(col(sizeCol).cast("double"))).head().getDouble(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_trial")
      .orderBy(xxhash64(col(idCol), col("_trial"), lit(seed)), col(idCol))
    df.select(col(idCol), col(sizeCol).cast("double").as("_sz"))
      .withColumn("_trial", explode(sequence(lit(0), lit(numTrials - 1))))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= numSamples)
      .groupBy("_trial")
      .agg(sum("_sz").as("_sub"))
      .orderBy("_trial")
      .collect()
      .map(r => totalSize - r.getDouble(1) / fractionSeen)
      .toSeq
  }
}
