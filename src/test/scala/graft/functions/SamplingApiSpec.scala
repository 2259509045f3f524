package graft.functions

import graft.SparkTestSession.{sf, spark}
import graft.{SparkEntry, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** The function-shaped Sampling APIs must agree exactly with the gated
  * queries that carry their oracles (the r4 lesson: public API and
  * gated plan must share machinery, asserted here against drift).
  */
class SamplingApiSpec extends AnyFunSuite {

  test("mixtureSample membership rolls up to sm04's kept counts") {
    val docs = Tables.documents(spark, sf)
    val api = Sampling.mixtureSample(docs)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gate = SparkEntry.queries("sm04_mixture_weights")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(api == gate.filter(_._2 > 0))
  }

  test("mixtureSample keeps all original columns and only kept rows") {
    val docs = Tables.documents(spark, sf)
    val out = Sampling.mixtureSample(docs)
    assert(out.columns.sorted.sameElements(docs.columns.sorted))
    assert(out.count() < docs.count())
  }

  test("mixtureSample shrink=1 with a uniform corpus keeps everything") {
    // per-source quota = total div nsrc = n_src exactly when sources are
    // equal-sized, so keep_ppm = 1e6 and nothing is dropped
    val docs = Tables.documents(spark, sf)
    val sizes = docs.groupBy("source").count()
      .select("count").distinct().count()
    assume(sizes == 1, "fixture sources are equal-sized")
    assert(Sampling.mixtureSample(docs, shrink = 1).count() == docs.count())
  }

  test("mixtureSample membership is invariant under repartitioning") {
    // the cluster-safety property: a 1000-executor rerun with different
    // partitioning must keep EXACTLY the same rows
    val docs = Tables.documents(spark, sf)
    val a = Sampling.mixtureSample(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.mixtureSample(docs.repartition(7)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("assignSplit matches sm02's split assignment") {
    val docs = Tables.documents(spark, sf)
    val api = Sampling.assignSplit(docs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gate = SparkEntry.queries("sm02_hash_split")(spark, sf)
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(api == gate)
  }

  test("assignSplit works with a renamed source column") {
    val docs = Tables.documents(spark, sf).withColumnRenamed("source", "domain")
    val out = Sampling.assignSplit(docs, sourceCol = "domain")
    assert(out.select("split").distinct().count() <= 3)
  }
}
