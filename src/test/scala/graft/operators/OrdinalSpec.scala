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

  test("null keys keep their rows and rank first, like the window they replace") {
    import spark.implicits._
    val df = Seq[java.lang.Long](null, 5L, null, 1L, 9L).toDF("k")
    val got = Ordinal.withGlobalOrdinal(df, "k", "rn", buckets = 3)
      .orderBy("rn").select("rn", "k").collect()
    // all 5 rows survive, ordinals dense 1..5, nulls first (ASC default)
    assert(got.map(_.getLong(0)).toSeq == (1L to 5L))
    assert(got.take(2).forall(_.isNullAt(1)))
    assert(got.drop(2).map(_.getLong(1)).toSeq == Seq(1L, 5L, 9L))
  }

  test("precomputed bounds skip the probe but produce the same ordinal") {
    val df = graft.Tables.orders(spark, sf).select("o_orderkey")
    val probed = Ordinal.withGlobalOrdinal(df, "o_orderkey", "rn", 8)
    val given = Ordinal.withGlobalOrdinal(df, "o_orderkey", "rn", 8,
      bounds = Some((1L, 15000L)))
    assert(given.exceptAll(probed).isEmpty && probed.exceptAll(given).isEmpty)
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
