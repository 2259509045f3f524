package graft.metrics

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metrics collection for a bounded run — the Spark-native source of
  * the byte counters the reference reads from its TF fork (bytes produced/
  * consumed, disk reads; SURVEY §1.3). Register around an action, then
  * read totals; all counters come from Spark's own TaskMetrics.
  */
final class StageMetricsListener extends SparkListener {
  private val input = new java.util.concurrent.atomic.AtomicLong
  private val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
  private val shuffleRead = new java.util.concurrent.atomic.AtomicLong
  private val spill = new java.util.concurrent.atomic.AtomicLong
  private val cpuTime = new java.util.concurrent.atomic.AtomicLong

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
