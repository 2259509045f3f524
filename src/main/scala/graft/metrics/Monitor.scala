package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A19 — OS-monitoring time series (statistics_collection.py:12-129):
  * a background thread samples process CPU, system load, and memory at a
  * fixed interval; samples flatten to a DataFrame with a timestamp column
  * (mirrors the reference's pandas frame, gen_util.py:159-174).
  */
final case class Sample(
    timestepMs: Long,
    cpuProcessLoad: Double,
    systemLoadAvg: Double,
    heapUsedBytes: Long,
    memoryFreeBytes: Long)

final class Monitor(intervalMs: Long = 200) {
  private val samples = new java.util.concurrent.ConcurrentLinkedQueue[Sample]()
  @volatile private var running = false
  private var thread: Thread = _

  def start(): Unit = {
    running = true
    thread = new Thread(() => {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      val rt = Runtime.getRuntime
      val t0 = System.currentTimeMillis()
      while (running) {
        samples.add(Sample(
          System.currentTimeMillis() - t0,
          math.max(0.0, os.getProcessCpuLoad),
          os.getSystemLoadAverage,
          rt.totalMemory() - rt.freeMemory(),
          os.getFreeMemorySize))
        Thread.sleep(intervalMs)
      }
    }, "graft-monitor")
    thread.setDaemon(true)
    thread.start()
  }

  def stop(): Seq[Sample] = {
    running = false
    if (thread != null) thread.join(2000)
    import scala.jdk.CollectionConverters._
    samples.iterator().asScala.toSeq
  }

  /** Context-manager style: monitor while `body` runs, return its result
    * plus the sampled series (test_statistics_collection.py pattern).
    */
  def monitored[T](body: => T): (T, Seq[Sample]) = {
    start()
    try { val r = body; (r, stop()) }
    catch { case e: Throwable => stop(); throw e }
  }
}

object Monitor {
  def toDF(spark: SparkSession, ss: Seq[Sample]): DataFrame = {
    import spark.implicits._
    ss.toDF()
  }
}

/** A25 — memory-pressure ballast (memory_management.py:13-131): hold heap
  * at a target fraction by allocating/freeing fixed-size chunks. Test-only
  * utility for cache-planner experiments under pressure.
  */
final class MemoryBallast(chunkBytes: Int = 8 << 20) {
  private val chunks = scala.collection.mutable.ArrayBuffer[Array[Byte]]()

  def holdFraction(target: Double): Unit = {
    val rt = Runtime.getRuntime
    def usedFrac = (rt.totalMemory() - rt.freeMemory()).toDouble / rt.maxMemory()
    var guard = 0
    while (usedFrac < target && guard < 10000) {
      chunks += new Array[Byte](chunkBytes)
      guard += 1
    }
    while (usedFrac > target && chunks.nonEmpty) chunks.remove(chunks.size - 1)
  }

  /** Allocate an explicit amount (deterministic variant for tests). */
  def hold(nBytes: Long): Unit = {
    var held = 0L
    while (held < nBytes) { chunks += new Array[Byte](chunkBytes); held += chunkBytes }
  }

  def heldBytes: Long = chunks.size.toLong * chunkBytes
  def release(): Unit = chunks.clear()
}
