package graft.operators

import graft.SparkTestSession.{sf, spark}
import org.scalatest.funsuite.AnyFunSuite

/** The curation ledger must agree signal-by-signal with the standalone
  * gated queries whose machinery it composes — the ledger is an
  * assembly, never a reimplementation.
  */
class CurationSpec extends AnyFunSuite {

  test("cu01 ledger agrees with tx01/tx05/dd08 and its own kept rule") {
    val rows = graft.SparkEntry.queries("cu01_curation_ledger")(spark, sf).collect()
    val n = graft.Tables.documents(spark, sf).count()
    assert(rows.length == n, "one ledger row per document")

    val lang = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    val tx01 = graft.SparkEntry.queries("tx01_langid")(spark, sf)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang == tx01, "pred_lang diverged from tx01")

    val quality = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val tx05 = graft.SparkEntry.queries("tx05_quality_filter")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(quality == tx05, "is_quality diverged from tx05")

    val clusters = rows.map(r => r.getLong(0) -> r.getLong(4)).toMap
    val dd08 = graft.SparkEntry.queries("dd08_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == dd08, "cluster_id diverged from dd08")

    // kept ≡ is_quality ∧ exact_keep ∧ near_keep, and near_keep ≡
    // (cluster_id = doc_id) — the ledger's own consistency rule
    assert(rows.forall { r =>
      r.getBoolean(7) == (r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(5)) &&
        r.getBoolean(5) == (r.getLong(4) == r.getLong(0))
    })
    spark.catalog.clearCache()
  }

  test("qualityKeeper keeps exactly the best-scoring member of every cluster") {
    val docs = graft.Tables.documents(spark, sf)
    val rows = graft.functions.Curation.qualityKeeper(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // one row per doc; clusters agree with dd08; exactly one keeper per
    // cluster, and it's the (max score, min doc_id) member
    assert(rows.length == docs.count())
    val dd08 = graft.SparkEntry.queries("dd08_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == dd08)
    rows.groupBy(_._2).foreach { case (_, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1)
      val best = members.minBy(m => (-m._3, m._1))
      assert(keepers.head._1 == best._1)
    }
    // at this SF some cluster's best copy is NOT the min-id member —
    // the query is genuinely different from cu01's representative
    val minIdDiffers = rows.groupBy(_._2).exists { case (cid, members) =>
      members.length > 1 && members.filter(_._4).head._1 != cid
    }
    assert(minIdDiffers, "expected a cluster whose best copy isn't min-id")
    spark.catalog.clearCache()
  }

  test("domainFilter blocks subdomains of blocked registered domains, never unparseable URLs") {
    import spark.implicits._
    val rows = graft.functions.Curation.domainFilter(
      Seq(
        (1L, "https://spam.bad-site.com/x"),
        (2L, "https://deep.cdn.bad-site.com/y"),
        (3L, "https://bad-site.com/z"),
        (4L, "https://good-site.com/a"),
        (5L, "not a url"),
        (6L, "https://localhost/b")) // single-label host: no reg_domain
        .toDF("doc_id", "url"),
      blocklist = Seq("bad-site.com"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("host"), r.getAs[String]("reg_domain"),
          r.getAs[Boolean]("blocked"))).toMap
    assert(rows(1L) == ("spam.bad-site.com", "bad-site.com", true))
    assert(rows(2L) == ("deep.cdn.bad-site.com", "bad-site.com", true))
    assert(rows(3L) == ("bad-site.com", "bad-site.com", true))
    assert(rows(4L) == ("good-site.com", "good-site.com", false))
    assert(rows(5L) == ("", "", false))
    assert(rows(6L) == ("localhost", "", false))
  }

  test("classifierScore separates normal text from degenerate repetition") {
    import spark.implicits._
    val normal = "the quick brown fox jumps over a lazy dog near the old " +
      "stone bridge and waits for the evening light to fade away slowly"
    val degenerate = Seq.fill(30)("spam").mkString(" ")
    val out = graft.functions.TextQuality.classifierScore(
      Seq((1L, normal), (2L, degenerate)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L)._2, s"normal doc rejected: logit=${out(1L)._1}")
    assert(!out(2L)._2, s"degenerate doc kept: logit=${out(2L)._1}")
    assert(out(1L)._1 > out(2L)._1)
  }

  test("domainFilter with an empty blocklist blocks nothing") {
    import spark.implicits._
    val out = graft.functions.Curation.domainFilter(
      Seq((1L, "https://spam.bad-site.com/x")).toDF("doc_id", "url"))
    assert(out.collect().forall(!_.getAs[Boolean]("blocked")))
  }

  test("Curation.ledger accepts renamed id/text/source columns") {
    import org.apache.spark.sql.functions.col
    val renamed = graft.Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text").as("body"),
        col("source").as("origin"))
    val out = graft.functions.Curation
      .ledger(renamed, idCol = "id", textCol = "body", sourceCol = "origin")
    assert(out.columns.head == "id")
    assert(out.count() == graft.Tables.documents(spark, sf).count())
    spark.catalog.clearCache()
  }

  test("cu08 split is cluster-atomic: near-dups never straddle a boundary") {
    val rows = graft.SparkEntry.queries("cu08_cluster_split")(spark, sf).collect()
    val dd08 = graft.SparkEntry.queries("dd08_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == dd08,
      "cu08 clusters diverged from dd08")
    // the leakage-safety property itself: one split per cluster
    rows.groupBy(_.getLong(1)).foreach { case (cid, rs) =>
      assert(rs.map(_.getString(2)).toSet.size == 1,
        s"cluster $cid straddles splits")
    }
    val bySplit = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "valid", "test"),
      s"missing split bucket: $bySplit")
    assert(bySplit("train") > bySplit("valid") && bySplit("train") > bySplit("test"),
      s"train should dominate: $bySplit")
    spark.catalog.clearCache()
  }

  test("cu15 equal-mass shards: masses within one max-document of the " +
    "ideal, conservation holds, shard count free") {
    val docs = graft.Tables.documents(spark, sf)
    val total = docs.selectExpr("cast(sum(n_chars) as long)").collect()(0).getLong(0)
    val maxDoc = docs.selectExpr("cast(max(n_chars) as long)").collect()(0).getLong(0)
    for (shards <- Seq(1, 4, 8)) {
      val rows = graft.functions.Curation
        .equalMassShards(docs, shards).collect()
      // conservation: every document lands in exactly one shard
      assert(rows.map(_.getAs[Long]("mass")).sum == total, s"shards=$shards")
      assert(rows.map(_.getAs[Long]("shard_id")).sorted.toSeq ==
        (0L until shards.toLong), s"shards=$shards")
      // the equal-mass bound: a cut lands mid-document at most once per
      // boundary, so every shard's mass is within one max document of
      // total/shards
      val ideal = total.toDouble / shards
      rows.foreach { r =>
        assert(math.abs(r.getAs[Long]("mass") - ideal) <= maxDoc.toDouble,
          s"shards=$shards shard=${r.getAs[Long]("shard_id")} " +
            s"mass=${r.getAs[Long]("mass")} ideal=$ideal maxDoc=$maxDoc")
      }
      spark.catalog.clearCache()
    }
  }

  test("equalMassAssign is the row-level table equalMassShards rolls up " +
    "(the physical writer consumes the SAME cut the gated rollup proves)") {
    val docs = graft.Tables.documents(spark, sf)
    val fromAssign = graft.functions.Curation.equalMassAssign(docs, 8)
      .groupBy("shard_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum("n_chars").as("mass"))
      .collect()
      .map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("mass"))).sortBy(_._1).toSeq
    val fromShards = graft.functions.Curation.equalMassShards(docs, 8)
      .collect()
      .map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("mass"))).sortBy(_._1).toSeq
    assert(fromAssign == fromShards)
    // and every document appears exactly once in the assignment
    assert(graft.functions.Curation.equalMassAssign(docs, 8)
      .select("doc_id").distinct().count() == docs.count())
    spark.catalog.clearCache()
  }
}
