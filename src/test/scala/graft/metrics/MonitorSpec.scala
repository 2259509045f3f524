package graft.metrics

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

class MonitorSpec extends AnyFunSuite {

  test("monitored block produces ≥1 sample with a time series") {
    val m = new Monitor(intervalMs = 50)
    val (result, samples) = m.monitored {
      Thread.sleep(200); 42
    }
    assert(result == 42)
    assert(samples.nonEmpty)
    assert(samples.map(_.timestepMs).sorted == samples.map(_.timestepMs))
    val df = Monitor.toDF(spark, samples)
    assert(df.columns.contains("cpuProcessLoad") && df.count() == samples.size)
    // reference Sample parity: frequency/temperature/io columns present
    // (statistics_collection.py:13-19); values are -1 when the platform
    // exposes no probe, a real reading otherwise — never a throw
    assert(Set("cpuFreqMhz", "cpuTempC", "ioReadBytes", "ioWriteBytes")
      .subsetOf(df.columns.toSet))
    assert(samples.forall(s => s.cpuFreqMhz == -1.0 || s.cpuFreqMhz > 0))
    assert(samples.forall(s => s.cpuTempC == -1.0 || s.cpuTempC > -274))
  }

  test("os probes read procfs/sysfs without throwing") {
    // on this Linux container /proc/self/io and /proc/cpuinfo exist; the
    // API contract is only "never throw, -1 when unknown"
    val f = OsProbes.cpuFreqMhz()
    val t = OsProbes.cpuTempC()
    val (r, w) = OsProbes.processIo()
    assert(f == -1.0 || f > 0)
    assert(t == -1.0 || t > -274)
    assert(r >= -1L && w >= -1L)
  }

  test("memory ballast holds and releases chunks") {
    val b = new MemoryBallast(chunkBytes = 1 << 20)
    b.hold(32L << 20)
    assert(b.heldBytes >= (32L << 20))
    b.release()
    assert(b.heldBytes == 0)
    // fraction API is a no-op when already at/above target (never OOMs)
    b.holdFraction(0.0)
    assert(b.heldBytes == 0)
  }
}
