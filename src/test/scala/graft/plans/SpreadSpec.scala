package graft.plans

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

/** Tables.spread — the r18 adaptive fan-out for CPU-heavy projections
  * over tiny unsplittable scans. The contract under test: a single-leaf
  * file scan whose planned split count is below defaultParallelism gets
  * round-robined to defaultParallelism with values untouched; anything
  * else (multi-leaf plans, local relations) passes through UNCHANGED —
  * the production no-op that keeps the helper scale-safe.
  */
class SpreadSpec extends AnyFunSuite {
  import spark.implicits._

  test("a tiny single-split scan is spread to defaultParallelism, values intact") {
    val docs = graft.Tables.documents(spark, sf)
    val before = docs.rdd.getNumPartitions
    val p = spark.sparkContext.defaultParallelism
    assume(before < p) // the fixture is a single-row-group file
    val sp = graft.Tables.spread(docs)
    assert(sp.rdd.getNumPartitions == p)
    assert(sp.collect().map(_.toString).sorted.toSeq ==
      docs.collect().map(_.toString).sorted.toSeq)
  }

  test("projections/filters above the scan still spread (single leaf)") {
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "lower(text) as t").filter("doc_id % 2 = 0")
    assert(graft.Tables.spread(docs).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("derived inputs pass through untouched: joins, unions, local relations") {
    val docs = graft.Tables.documents(spark, sf)
    val joined = docs.join(docs.select("doc_id"), "doc_id")
    assert(graft.Tables.spread(joined) eq joined)
    val unioned = docs.union(docs)
    assert(graft.Tables.spread(unioned) eq unioned)
    val local = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(graft.Tables.spread(local) eq local)
  }
}
