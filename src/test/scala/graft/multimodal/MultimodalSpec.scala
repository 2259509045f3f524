package graft.multimodal

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  test("binary payload decode plumbing: schema, counts, determinism") {
    val payloads = DecodeStub.payloadView(spark, sf)
    assert(payloads.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val feats = DecodeStub.decode(spark, payloads).collect()
    assert(feats.length == payloads.count())
    assert(feats.forall(_.features.length == DecodeStub.featureDim))
    // deterministic stub: same input → same features across runs
    val again = DecodeStub.decode(spark, payloads).collect()
    val a = feats.sortBy(_.doc_id).map(_.features.toSeq)
    val b = again.sortBy(_.doc_id).map(_.features.toSeq)
    assert(a.sameElements(b))
    // nbytes matches the source text byte length
    val n0 = feats.minBy(_.doc_id)
    val t0 = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === n0.doc_id)
      .selectExpr("octet_length(text)").head().getInt(0)
    assert(n0.nbytes == t0)
  }
}
