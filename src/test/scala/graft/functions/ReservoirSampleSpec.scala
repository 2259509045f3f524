package graft.functions

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

class ReservoirSampleSpec extends AnyFunSuite {

  test("keeps exactly k items, all drawn from the input") {
    ReservoirSample.register(spark)
    val rows = spark.sql(
      "select reservoir_sample(id, 10, 7L) as s from range(1000)").head()
    val sample = rows.getSeq[Long](0)
    assert(sample.size == 10)
    assert(sample.forall(v => v >= 0 && v < 1000))
    assert(sample.distinct.size == 10) // ids unique → sample unique
  }

  test("groups smaller than k keep everything") {
    ReservoirSample.register(spark)
    val s = spark.sql("select reservoir_sample(id, 50, 1L) as s from range(20)")
      .head().getSeq[Long](0)
    assert(s.sorted == (0L until 20L))
  }

  test("single-partition sampling is seed-deterministic") {
    ReservoirSample.register(spark)
    def run(): Seq[Long] = spark.sql(
      "select reservoir_sample(id, 5, 99L) as s from (select id from range(500, 1, 1))")
      .head().getSeq[Long](0)
    assert(run() == run())
  }

  test("sampling is roughly uniform (χ²-ish sanity over halves)") {
    ReservoirSample.register(spark)
    // 200 independent samples of 10 from 0..999; count how many land < 500
    val below = (1 to 50).map { i =>
      spark.sql(s"select reservoir_sample(id, 10, ${i}L) as s from range(1000)")
        .head().getSeq[Long](0).count(_ < 500)
    }.sum
    // expect ~250 of 500 draws below the midpoint; allow generous slack
    assert(below > 150 && below < 350, s"below=$below of 500")
  }

  test("per-shard reservoir shuffle over real data (bounded-buffer emulation)") {
    ReservoirSample.register(spark)
    graft.Tables.lineitem(spark, sf).createOrReplaceTempView("li_rs")
    val out = spark.sql(
      """select shard, explode(sample) as l_orderkey from (
        |  select l_orderkey % 4 as shard,
        |         reservoir_sample(l_orderkey, 100, 5L) as sample
        |  from li_rs group by l_orderkey % 4)""".stripMargin)
    assert(out.count() == 400) // 4 shards × k=100
    // every sampled key belongs to its shard
    assert(out.filter("l_orderkey % 4 <> shard").count() == 0)
  }

  test("array-typed items are deep-copied, not buffer-aliased") {
    // Spark reuses the UnsafeArrayData buffer across rows: without a deep
    // copy every stored reservoir item would alias the LAST row's array.
    // Each input array is (id, id+1), so a corrupted sample shows arrays
    // whose second element isn't first+1 — or all-identical arrays.
    ReservoirSample.register(spark)
    val rows = spark.sql(
      """select explode(s) as a from (
        |  select reservoir_sample(array(id, id + 1), 20, 3L) as s
        |  from range(1000))""".stripMargin).collect()
    val arrays = rows.map(_.getSeq[Long](0))
    assert(arrays.length == 20)
    assert(arrays.forall(a => a(1) == a(0) + 1))
    assert(arrays.map(_.head).distinct.length == 20) // ids unique → no aliasing
  }

  test("string items survive buffer reuse (UTF8String deep copy)") {
    ReservoirSample.register(spark)
    val rows = spark.sql(
      """select explode(s) as v from (
        |  select reservoir_sample(concat('row-', id), 15, 11L) as s
        |  from range(500))""".stripMargin).collect()
    val vals = rows.map(_.getString(0))
    assert(vals.length == 15 && vals.distinct.length == 15)
    assert(vals.forall(_.startsWith("row-")))
  }
}
