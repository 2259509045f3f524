package graft.plans

import graft.SparkTestSession.{sf, spark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleToolsSpec extends AnyFunSuite {

  test("bucketed join runs without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Bucketing.writeBucketed(
        graft.Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", 8, sortCol = Some("o_orderkey"))
      Bucketing.writeBucketed(
        graft.Tables.lineitem(spark, sf)
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "b_lineitem", "o_orderkey", 8, sortCol = Some("o_orderkey"))
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      assert(joined.count() == 6000) // every lineitem row matches its order
      assert(!Bucketing.hasShuffle(joined),
        "bucketed join should not shuffle:\n" + joined.queryExecution.executedPlan)
      // control: the same join over raw parquet DOES shuffle
      val raw = graft.Tables.orders(spark, sf).select("o_orderkey")
        .join(
          graft.Tables.lineitem(spark, sf).select(col("l_orderkey").as("o_orderkey")),
          "o_orderkey")
      raw.count()
      assert(Bucketing.hasShuffle(raw))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join equals the plain join result") {
    val orders = graft.Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val plain = li.join(orders, "o_orderkey")
    val salted = SkewTools.saltedJoin(li, orders, "o_orderkey", saltBuckets = 4)
    assert(salted.count() == plain.count())
    val a = plain.groupBy("o_orderkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = salted.groupBy("o_orderkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("bloom prefilter: exact join result, big side shrinks pre-shuffle") {
    import graft.SparkTestSession.{sf, spark}
    val big = graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val small = graft.Tables.orders(spark, sf)
      .filter("o_orderkey % 40 = 0")
      .selectExpr("o_orderkey as l_orderkey", "o_totalprice")
    // exactness: bloom-prefiltered join == plain join (fp removed by join)
    val bloomed = BloomPrefilter.join(big, small, "l_orderkey")
      .select("l_orderkey", "l_quantity", "o_totalprice")
    val plain = big.join(small, "l_orderkey")
      .select("l_orderkey", "l_quantity", "o_totalprice")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
    // the prefilter genuinely drops rows before the join
    val kept = BloomPrefilter.prefilter(big, small, "l_orderkey").count()
    assert(kept < big.count() / 10) // 1-in-40 keys + false positives
    assert(kept >= plain.select("l_orderkey").count())
  }
}
