package graft.streaming

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  test("structured-streaming windowed agg equals the batch rendering") {
    val streamed = StreamRunner.windowedAgg(spark, sf, "graft_stream_spec")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.streaming.StreamingOps.queries.find(_.name == "st01_window_agg").get
      .fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
