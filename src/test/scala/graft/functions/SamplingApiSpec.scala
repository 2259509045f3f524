package graft.functions

import graft.SparkTestSession.{sf, spark}
import graft.{SparkEntry, Tables}
import org.apache.spark.sql.functions.col
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

  test("importanceWeights ranks target-vocabulary docs above the rest") {
    import spark.implicits._
    // target docs draw from one vocabulary, background from another:
    // a doc written in target vocab must carry a far higher mean weight
    val docs = Seq(
      (1L, true, "apple banana cherry apple banana"),
      (2L, true, "cherry apple banana cherry"),
      (3L, false, "dog elephant ferret giraffe heron"),
      (4L, false, "ferret dog giraffe heron elephant dog"),
      (5L, false, "apple dog banana elephant")) // mixed
      .toDF("doc_id", "tgt", "text")
    val w = Sampling.importanceWeights(docs, col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(w(1L) > w(3L) && w(2L) > w(4L))
    // the mixed doc sits strictly between pure-target and pure-background
    assert(w(5L) < w(1L) && w(5L) > w(3L))
  }

  test("importanceWeights matches the gated sm05 query and is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val api = Sampling.importanceWeights(docs, col("source") === "src0")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gate = SparkEntry.queries("sm05_dsir_weights")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(api == gate)
    val repart = Sampling
      .importanceWeights(docs.repartition(7), col("source") === "src0")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(repart == api)
  }

  test("fluencyBuckets terciles are balanced per source and keep rules hold") {
    val docs = Tables.documents(spark, sf)
    val rows = graft.functions.Sampling.fluencyBuckets(docs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getBoolean(4)))
    assert(rows.length == docs.count())
    // head is never dropped, tail never kept
    assert(rows.filter(_._4 == "head").forall(_._5))
    assert(rows.filter(_._4 == "tail").forall(!_._5))
    // per source: |head| = floor(n/3), buckets ordered by score
    rows.groupBy(_._2).foreach { case (_, g) =>
      val n = g.length
      assert(g.count(_._4 == "head") == n / 3)
      assert(g.count(_._4 == "middle") == 2 * n / 3 - n / 3)
      val headMin = g.filter(_._4 == "head").map(_._3).min
      val tailMax = g.filter(_._4 == "tail").map(_._3).max
      assert(headMin >= tailMax)
    }
    // middle keeps roughly half (hash-ppm 500k): sanity band, not exact
    val mid = rows.filter(_._4 == "middle")
    val kept = mid.count(_._5)
    assert(kept > mid.length / 4 && kept < 3 * mid.length / 4)
    spark.catalog.clearCache()
  }

  test("fluencyBuckets membership is invariant under repartitioning") {
    val docs = Tables.documents(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.functions.Sampling.fluencyBuckets(df)
        .collect().map(r => (r.getLong(0), r.getString(3), r.getBoolean(4))).toSet
    val a = run(docs)
    val b = run(docs.repartition(7))
    assert(a == b)
    spark.catalog.clearCache()
  }

  test("importanceWeights rejects a non-positive bucket count") {
    val docs = Tables.documents(spark, sf)
    val e = intercept[IllegalArgumentException] {
      Sampling.importanceWeights(docs, col("source") === "src0", buckets = 0)
    }
    assert(e.getMessage.contains("buckets"))
  }

  test("universeSample is join-consistent: no sampled fact row is orphaned") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val so = Sampling.universeSample(o, "o_custkey").select("o_custkey").distinct()
    val sc = Sampling.universeSample(c, "c_custkey")
      .select(col("c_custkey").as("o_custkey")).distinct()
    // every sampled order's customer row survives sampling too (the
    // property independent per-table Bernoulli destroys)
    assert(so.join(sc, Seq("o_custkey"), "left_anti").count() == 0)
    // the key universe is ~10%: deterministic hash, loose band
    val kept = sc.count().toDouble
    val all = c.count().toDouble
    assert(kept / all > 0.03 && kept / all < 0.25,
      s"universe kept ${kept / all} of keys, expected ~0.10")
    // gated sm09 accounting is internally consistent with its own flags
    val rows = SparkEntry.queries("sm09_universe_sample")(spark, sf).collect()
    rows.foreach { r =>
      val (nTrue, nSamp) = (r.getLong(1), r.getLong(2))
      assert(nSamp <= nTrue)
      val (tru, est, err) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(err == ((est - tru) * 10000L) / tru ||
        err == Math.floorDiv((est - tru) * 10000L, tru))
    }
  }
}
