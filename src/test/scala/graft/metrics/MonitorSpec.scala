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
