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

  test("precomputed splits skip the probe but produce the same ordinal") {
    val df = graft.Tables.orders(spark, sf).select("o_orderkey")
    val probed = Ordinal.withGlobalOrdinal(df, "o_orderkey", "rn", 8)
    val given = Ordinal.withGlobalOrdinal(df, "o_orderkey", "rn", 8,
      splits = Some(Ordinal.quantileSplits(df, "o_orderkey", 8)))
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

  test("skewed keys (99% clustered in 1% of the range) still bucket evenly") {
    import spark.implicits._
    // 5000 ids packed into [0, 100) plus a handful of far outliers — an
    // equal-width bucketing over [0, 1e12] would put 99.9% of rows in
    // bucket 0 and serialize the rank there.
    val keys = (0 until 5000).map(i => (i % 100).toLong * 1L) ++
      Seq(1_000_000_000_000L, 999_999_999_999L, 500_000_000_000L)
    val df = keys.toDF("k").repartition(8)
    val buckets = 16
    val bs = Ordinal.quantileSplits(df, "k", buckets)
    val counts = df
      .withColumn(
        "b",
        aggregate(
          typedLit(bs.toSeq), lit(0L),
          (acc, s) => acc + when(col("k").cast("double") > s, 1L).otherwise(0L)))
      .groupBy("b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no bucket may hold more than ~3× its fair share (fair = n/buckets);
    // equal-width would have put >99% of all rows in one bucket
    val fair = keys.size.toDouble / buckets
    assert(counts.values.max <= (3 * fair).toLong, counts.toSeq.sorted.mkString(", "))
    // and the ordinal built on those splits is still the exact row_number
    val got = Ordinal.withGlobalOrdinal(df, "k", "rn", buckets)
      .orderBy("rn", "k").select("k").as[Long].collect()
    assert(got.toSeq == keys.sorted)
  }

  test("distributed prefix sum equals the global exclusive running sum, " +
    "bucket count free (q_file_compaction/an18's contract)") {
    import spark.implicits._
    // duplicated keys + negative values + a null value row exercise the
    // tie-bucketing, sum algebra, and sum's null-skipping in one frame
    val rows = (1L to 300L).map(i => (i % 11, i, (i % 5) - 2))
    val df = rows.toDF("k", "id", "v")
      .withColumn("v", when(col("id") % 13 === 0, lit(null)).otherwise(col("v")))
    val reference = df.withColumn("cum",
      coalesce(
        sum("v").over(Window.orderBy("k", "id")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).cast("long"))
    for (buckets <- Seq(1, 4, 32)) {
      val got = Ordinal.withGlobalPrefixSum(df, "k", "v", "cum", buckets,
        tieCols = Seq("id"))
      assert(got.select("k", "id", "cum").exceptAll(
        reference.select("k", "id", "cum")).isEmpty, s"buckets=$buckets")
    }
  }

  test("prefix sum plans no payload-sized single-partition window") {
    val df = graft.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "cast(o_custkey as long) as v")
    val plan = Ordinal.withGlobalPrefixSum(df, "o_orderkey", "v", "cum")
      .queryExecution.executedPlan.toString
    // the only unpartitioned window runs over the tiny per-bucket sum
    // table (input = an aggregate keyed by _ord_b), never the scan
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("Window [") && !l.contains("windowspecdefinition(_ord_b")).toSeq
    assert(globalWindows.forall(_.contains("_ord_s")), plan.take(2000))
  }

  test("STRING keys: distributed ordinal equals the global row_number, " +
    "bucket count free, nulls first, duplicate keys tie-broken (r17 #2)") {
    import spark.implicits._
    // duplicated keys + nulls + multi-byte UTF-8 (é, 中, and a
    // supplementary-plane emoji — where Java String order and Spark's
    // UTF8_BINARY collation DISAGREE) in one frame
    val keys = (1L to 200L).map(i => s"doc_${i % 37}") ++
      Seq("é_accent", "中文", "😀_emoji", "zz", "") ++
      Seq(null, null)
    val df = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "id")
    val reference = df.withColumn("rn",
      row_number().over(Window.orderBy("k", "id")).cast("long"))
    for (buckets <- Seq(1, 4, 32)) {
      val got = Ordinal.withGlobalOrdinal(df, "k", "rn", buckets,
        tieCols = Seq("id"))
      assert(got.select("k", "id", "rn").exceptAll(
        reference.select("k", "id", "rn")).isEmpty, s"buckets=$buckets")
    }
  }

  test("STRING keys: no payload-sized single-partition window in the plan, " +
    "and sampled boundaries bucket a skewed distribution evenly") {
    val df = graft.Tables.customer(spark, sf).select("c_name", "c_custkey")
    val plan = Ordinal.withGlobalOrdinal(df, "c_name", "rn",
      tieCols = Seq("c_custkey"))
      .queryExecution.executedPlan.toString
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("Window [") && !l.contains("windowspecdefinition(_ord_b")).toSeq
    assert(globalWindows.forall(_.contains("_ord_n")), plan.take(2000))

    // skew: 99% of keys share one hot prefix — equal-width alphabet
    // splitting would serialize them; sampled boundaries cut INSIDE the
    // hot prefix so no bucket exceeds ~3x its fair share
    import spark.implicits._
    val keys = (0 until 5000).map(i => f"hot_${i % 100}%04d") ++
      Seq("aaa", "zzz", "mmm")
    val skewed = keys.toDF("k").repartition(8)
    val buckets = 16
    val bs = Ordinal.sampledStringSplits(skewed, "k", buckets)
    assert(bs.nonEmpty && bs.length <= buckets - 1)
    val counts = skewed
      .withColumn("b",
        aggregate(typedLit(bs.toSeq), lit(0L),
          (acc, s) => acc + when(col("k") > s, 1L).otherwise(0L)))
      .groupBy("b").count().collect().map(_.getLong(1))
    val fair = keys.size.toDouble / buckets
    assert(counts.max <= (3 * fair).toLong, counts.sorted.mkString(", "))
  }

  test("STRING keys: precomputed strSplits skip the sample pass but " +
    "produce the same ordinal (the Compiler's instrumented-probe path)") {
    val df = graft.Tables.customer(spark, sf).select("c_name", "c_custkey")
    val probed = Ordinal.withGlobalOrdinal(df, "c_name", "rn", 8,
      tieCols = Seq("c_custkey"))
    val given = Ordinal.withGlobalOrdinal(df, "c_name", "rn", 8,
      strSplits = Some(Ordinal.sampledStringSplits(df, "c_name", 8)),
      tieCols = Seq("c_custkey"))
    assert(given.exceptAll(probed).isEmpty && probed.exceptAll(given).isEmpty)
  }

  test("partitionCols reset the ordinal per partition exactly like the " +
    "partitioned window, in one pass (ss17's stacked-arm contract, r19)") {
    import spark.implicits._
    // two arms with DISJOINT key ranges (bm25-like vs cosine-like) so the
    // shared bucket boundaries land lopsided per arm — the rank must not
    // care — plus duplicate keys inside each arm for the tie path
    val rows = (1L to 150L).map(i => (i % 3, (i % 11).toDouble / (i % 3 + 1), i))
    val df = rows.toDF("arm", "score", "id")
    val reference = df.withColumn("rn",
      row_number().over(
        Window.partitionBy("arm").orderBy("score", "id")).cast("long"))
    for (buckets <- Seq(1, 4, 32)) {
      val got = Ordinal.withGlobalOrdinal(df, "score", "rn", buckets,
        tieCols = Seq("id"), partitionCols = Seq("arm"))
      assert(got.select("arm", "score", "id", "rn").exceptAll(
        reference.select("arm", "score", "id", "rn")).isEmpty, s"buckets=$buckets")
    }
    // and empty partitionCols still plans the exact pre-r19 shape: no
    // payload-sized single-partition window appears
    val plan = Ordinal.withGlobalOrdinal(df, "score", "rn",
      partitionCols = Seq("arm"))
      .queryExecution.executedPlan.toString
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("Window [") && !l.contains("windowspecdefinition(arm")).toSeq
    assert(globalWindows.isEmpty, plan.take(2000))
  }

  test("tieCols break duplicate-key ties exactly like the compound window " +
    "(ss17's arm-ranking contract)") {
    import spark.implicits._
    // heavy duplication across the key column so ties straddle would-be
    // bucket boundaries if duplicates didn't share a bucket
    val rows = (1L to 200L).map(i => (i % 7, i))
    val df = rows.toDF("score", "id")
    val reference = df.withColumn("rn",
      row_number().over(Window.orderBy("score", "id")).cast("long"))
    for (buckets <- Seq(1, 4, 32)) {
      val got = Ordinal.withGlobalOrdinal(df, "score", "rn", buckets,
        tieCols = Seq("id"))
      assert(got.select("score", "id", "rn").exceptAll(
        reference.select("score", "id", "rn")).isEmpty, s"buckets=$buckets")
    }
  }
}
