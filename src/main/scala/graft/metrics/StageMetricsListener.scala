package graft.metrics

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}

/** One traced stage execution as a named time span — the Spark-native
  * analogue of the reference's iterator-trace spans (span.name /
  * start_time / end_time, graph_rewrites.py:266-320): a Spark stage IS
  * the engine's unit of traced work, its name repeats across jobs the
  * way the reference's span names repeat across contexts, and the
  * listener observes it for free. `jobId` groups spans into contexts.
  */
final case class StageSpan(name: String, jobId: Int, startMs: Long, endMs: Long) {
  def durationMs: Long = endMs - startMs
}

/** Task-metrics collection for a bounded run — the Spark-native source of
  * the byte counters the reference reads from its TF fork (bytes produced/
  * consumed, disk reads; SURVEY §1.3). Register around an action, then
  * read totals; all counters come from Spark's own TaskMetrics. Also
  * records per-stage [[StageSpan]]s for the span-context surface.
  */
final class StageMetricsListener extends SparkListener {
  private val input = new java.util.concurrent.atomic.AtomicLong
  private val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
  private val shuffleRead = new java.util.concurrent.atomic.AtomicLong
  private val spill = new java.util.concurrent.atomic.AtomicLong
  private val cpuTime = new java.util.concurrent.atomic.AtomicLong
  private val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
  private val spanQ = new java.util.concurrent.ConcurrentLinkedQueue[StageSpan]()

  override def onJobStart(js: SparkListenerJobStart): Unit =
    js.stageIds.foreach(id => stageJob.put(id, js.jobId))

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val i = sc.stageInfo
    for { s <- i.submissionTime; e <- i.completionTime } spanQ.add(StageSpan(
      // stage names are "<action> at <callsite>" — a stable grouping key
      i.name.linesIterator.nextOption().getOrElse(i.name),
      Option(stageJob.get(i.stageId)).fold(-1)(_.intValue),
      s, e))
  }

  /** Completed-stage spans observed while attached, in completion order. */
  def spans: Seq[StageSpan] = {
    import scala.jdk.CollectionConverters._
    spanQ.iterator().asScala.toSeq
  }

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      input.addAndGet(m.inputMetrics.bytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      spill.addAndGet(m.diskBytesSpilled)
      cpuTime.addAndGet(m.executorCpuTime)
    }
  }

  def inputBytes: Long = input.get
  def shuffleWriteBytes: Long = shuffleWrite.get
  def shuffleReadBytes: Long = shuffleRead.get
  def spillBytes: Long = spill.get
  def executorCpuNs: Long = cpuTime.get

  /** Run `body` with this listener attached; totals reflect only work
    * scheduled during the block (single-threaded driver assumption).
    */
  def collect[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    spark.sparkContext.addSparkListener(this)
    try {
      val r = body
      // listener bus is async; give queued task-end events a beat to drain
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext, 10000)
      r
    } finally spark.sparkContext.removeSparkListener(this)
  }
}
