package graft.operators

import graft.SparkTestSession.{sf, spark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OrdinalSpec extends AnyFunSuite {

  test("distributed ordinal equals the global row_number, bucket count free") {
    val df = graft.Tables.orders(spark, sf).select("o_orderkey")
    val reference = df
      .withColumn("rn", row_number().over(Window.orderBy("o_orderkey")).cast("long"))
    for (buckets <- Seq(1, 7, 32)) {
      val got = Ordinal.withGlobalOrdinal(df, "o_orderkey", "rn", buckets)
      assert(got.select("o_orderkey", "rn").exceptAll(
        reference.select("o_orderkey", "rn")).isEmpty)
    }
  }

  test("no payload-sized single-partition window in the plan") {
    val df = graft.Tables.orders(spark, sf).select("o_orderkey")
    val plan = Ordinal.withGlobalOrdinal(df, "o_orderkey", "rn")
      .queryExecution.executedPlan.toString
    // the only unpartitioned window runs over the tiny bucket-count table
    // (input = an aggregate), never over the scan itself
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("Window [") && !l.contains("windowspecdefinition(_ord_b")).toSeq
    assert(globalWindows.forall(_.contains("_ord_n")), plan.take(2000))
  }

  test("sparse and negative keys still produce a dense 1..n ordinal") {
    import spark.implicits._
    val df = Seq(-100L, -3L, 0L, 7L, 7000L, 123456L).toDF("k")
    val got = Ordinal.withGlobalOrdinal(df, "k", "rn", buckets = 4)
      .orderBy("rn").select("k", "rn").as[(Long, Long)].collect()
    assert(got.map(_._2).toSeq == (1L to 6L))
    assert(got.map(_._1).toSeq == Seq(-100L, -3L, 0L, 7L, 7000L, 123456L))
  }
}
