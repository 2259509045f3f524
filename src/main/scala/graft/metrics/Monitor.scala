package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A19 — OS-monitoring time series (statistics_collection.py:12-129):
  * a background thread samples process CPU, system load, memory, CPU
  * frequency/temperature, and process IO at a fixed interval; samples
  * flatten to a DataFrame with a timestamp column (mirrors the
  * reference's pandas frame, gen_util.py:159-174).
  *
  * The reference's Sample tuple is (timestep, cpu_frequency,
  * cpu_temperature, cpu_percent, io_usage, memory_usage)
  * (statistics_collection.py:13-19); frequency/temperature/IO aren't
  * reachable via JMX, so they come from Linux procfs/sysfs and report -1
  * on platforms where neither source reads — the sampler never throws.
  */
final case class Sample(
    timestepMs: Long,
    cpuProcessLoad: Double,
    systemLoadAvg: Double,
    heapUsedBytes: Long,
    memoryFreeBytes: Long,
    cpuFreqMhz: Double,     // psutil.cpu_freq().current analogue; -1 if unknown
    cpuTempC: Double,       // hottest thermal zone; -1 if unknown
    ioReadBytes: Long,      // process cumulative (psutil io_counters analogue)
    ioWriteBytes: Long)

object OsProbes {
  private def readFile(p: String): Option[String] =
    try Some(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
    catch { case _: Throwable => None }

  /** Current CPU frequency in MHz: sysfs scaling_cur_freq (kHz) when
    * present (re-read each sample — it's live and a single small file);
    * otherwise the /proc/cpuinfo "cpu MHz" average, re-parsed every
    * [[cpuinfoRefreshEvery]]th sample: on VMs/containers it reports a
    * fixed nominal clock, but on bare-metal Linux without cpufreq sysfs
    * it is LIVE (aperf/mperf-derived), so caching it permanently would
    * freeze a varying signal — the periodic refresh tracks it while
    * amortizing the full-file parse. -1 when neither source reads. The
    * source resolution is cached after the first call so unavailable
    * probes cost one failed read total, not one per sample. (The
    * check-then-act on `freqSource` is racy across sampler threads but
    * benign: concurrent writers converge to the same resolution.)
    */
  private val SysfsFreq = "/sys/devices/system/cpu/cpu0/cpufreq/scaling_cur_freq"
  // 0 = unresolved, 1 = sysfs (live), 2 = cpuinfo (periodic refresh), 3 = none
  @volatile private var freqSource = 0
  @volatile private var cachedCpuinfoMhz = -1.0
  private val cpuinfoRefreshEvery = 16
  private val cpuinfoCalls = new java.util.concurrent.atomic.AtomicLong(0)

  private def readSysfsFreq(): Option[Double] =
    readFile(SysfsFreq).flatMap(_.trim.toDoubleOption).map(_ / 1000.0)

  private def readCpuinfoFreq(): Option[Double] =
    readFile("/proc/cpuinfo").flatMap { txt =>
      val vals = txt.linesIterator
        .filter(_.startsWith("cpu MHz"))
        .flatMap(_.split(':').lastOption.flatMap(_.trim.toDoubleOption))
        .toSeq
      if (vals.isEmpty) None else Some(vals.sum / vals.size)
    }

  def cpuFreqMhz(): Double = {
    if (freqSource == 0) {
      if (readSysfsFreq().isDefined) freqSource = 1
      else readCpuinfoFreq() match {
        case Some(v) => cachedCpuinfoMhz = v; freqSource = 2
        case None => freqSource = 3
      }
    }
    freqSource match {
      case 1 => readSysfsFreq().getOrElse(-1.0)
      case 2 =>
        if (cpuinfoCalls.getAndIncrement() % cpuinfoRefreshEvery == 0)
          readCpuinfoFreq().foreach(cachedCpuinfoMhz = _)
        cachedCpuinfoMhz
      case _ => -1.0
    }
  }

  /** Hottest thermal zone in °C (sysfs reports milli-°C); -1 if none. */
  def cpuTempC(): Double = {
    val zones =
      try {
        val dir = new java.io.File("/sys/class/thermal")
        Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("thermal_zone"))
          .flatMap(z => readFile(z.getPath + "/temp"))
          .flatMap(_.trim.toDoubleOption)
      } catch { case _: Throwable => Array.empty[Double] }
    if (zones.isEmpty) -1.0 else zones.max / 1000.0
  }

  /** Cumulative process IO (read_bytes, write_bytes) from /proc/self/io;
    * (-1, -1) when unreadable.
    */
  def processIo(): (Long, Long) =
    readFile("/proc/self/io").map { txt =>
      def field(k: String): Long = txt.linesIterator
        .find(_.startsWith(k + ":"))
        .flatMap(_.split(':').lastOption.flatMap(_.trim.toLongOption))
        .getOrElse(-1L)
      (field("read_bytes"), field("write_bytes"))
    }.getOrElse((-1L, -1L))
}

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
        val (ioR, ioW) = OsProbes.processIo()
        samples.add(Sample(
          System.currentTimeMillis() - t0,
          math.max(0.0, os.getProcessCpuLoad),
          os.getSystemLoadAverage,
          rt.totalMemory() - rt.freeMemory(),
          os.getFreeMemorySize,
          OsProbes.cpuFreqMhz(),
          OsProbes.cpuTempC(),
          ioR, ioW))
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
