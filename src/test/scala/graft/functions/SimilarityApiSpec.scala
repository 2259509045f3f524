package graft.functions

import graft.SparkTestSession.{sf, spark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public similarity APIs must agree exactly with the oracle-gated
  * queries whose plans they expose (the cross-check that caught the
  * round-4 nearDupCandidates divergence for dedup).
  */
class SimilarityApiSpec extends AnyFunSuite {

  private def sorted(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("srpNearDup equals the gated ss10 query") {
    val e = graft.Tables.embeddings(spark, sf)
    val api = Similarity.srpNearDup(e, "vec_id", "embedding").collect()
    val gated = graft.SparkEntry.queries("ss10_srp_neardup")(spark, sf).collect()
    assert(api.nonEmpty)
    assert(sorted(api) == sorted(gated),
      s"API ${api.length} pairs vs gated ${gated.length}")
    spark.catalog.clearCache()
  }

  test("srpNearDup is dimension-parametric: 32-dim vectors with dim=32") {
    import spark.implicits._
    // two groups of identical 32-dim vectors, mutually orthogonal: every
    // within-group pair must surface (identical code -> same buckets,
    // cosine 1.0), no cross-group pair survives the cosine filter (0.0)
    val a = Array.tabulate(32)(i => if (i % 2 == 0) 1.0f else 0.0f)
    val b = Array.tabulate(32)(i => if (i % 2 == 1) 1.0f else 0.0f)
    val df = ((0L until 5L).map(i => (i, a)) ++ (5L until 10L).map(i => (i, b)))
      .toDF("id", "emb")
    val pairs = Similarity.srpNearDup(df, "id", "emb", dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val withinA = (for (i <- 0L until 5L; j <- i + 1 until 5L) yield (i, j)).toSet
    val withinB = (for (i <- 5L until 10L; j <- i + 1 until 10L) yield (i, j)).toSet
    assert(pairs == withinA ++ withinB)
  }

  test("srpNearDup fails fast on mismatched vector dimensionality") {
    import spark.implicits._
    // the round-5 weak spot: 32-dim input against the default 64-dim
    // planes must ERROR with an actionable message, never silently
    // return an id-capped subset
    val df = (0L until 6L).map(i => (i, Array.fill(32)(1.0f))).toDF("id", "emb")
    val ex = intercept[Exception] {
      Similarity.srpNearDup(df, "id", "emb").collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${msgs(t.getCause)}"
    assert(msgs(ex).contains("expected 64-dim vectors"))
  }

  test("semDedupCells equals gated ss25 and encodes the greedy within-cell rule") {
    val e = graft.Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
    val cent = graft.operators.SimilarityOps.trainedCentroids(e)
    val api = Similarity.semDedupCells(e, cent).collect()
    val gated = graft.SparkEntry.queries("ss25_semdedup_cells")(spark, sf).collect()
    assert(sorted(api) == sorted(gated),
      s"API ${api.length} rows vs gated ${gated.length}")
    val dropped = api.filter(_.getInt(2) == 0)
    val kept = api.filter(_.getInt(2) == 1)
    assert(dropped.nonEmpty, "fixture must exercise the drop arm")
    assert(kept.nonEmpty, "fixture must exercise the keep arm")
    // Independent recount of the greedy rule over the ledger's own cell
    // assignment: dropped == exactly the ids dominated by a lower-id
    // within-cell neighbor above the threshold.
    import spark.implicits._
    val ledger = api.map(r => (r.getLong(0), r.getInt(1))).toSeq
      .toDF("vec_id", "cell")
    val withVec = ledger.join(e.select("vec_id", "embedding"), "vec_id")
    val domIds = withVec.toDF("a_id", "cell", "ea")
      .join(withVec.toDF("b_id", "cell", "eb"), "cell")
      .filter(col("a_id") < col("b_id"))
      .filter(expr("cosine_similarity(ea, eb) > 0.3"))
      .select("b_id").distinct().collect().map(_.getLong(0)).toSet
    assert(dropped.map(_.getLong(0)).toSet == domIds)
    // every dropped row's keeper is a lower id assigned to the same cell
    val cellOf = api.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dropped.forall(r =>
      r.getLong(3) < r.getLong(0) && cellOf(r.getLong(3)) == r.getInt(1)))
    // the organic fixture's label-balanced cells must not trip the
    // hot-cell guard
    assert(!graft.operators.SimilarityOps.lastHotCellFlagged)
    spark.catalog.clearCache()
  }

  test("semDedupCells hot-cell guard flags a flooded cell, stays quiet when balanced") {
    import spark.implicits._
    val SO = graft.operators.SimilarityOps
    // 8-cell one-hot codebook
    val cent = (0 until 8).map { c =>
      (c, Array.tabulate(64)(i => if (i == c) 1.0f else 0.0f))
    }.toDF("cell", "ce")
    // flood: 300 identical vectors all land in cell 0 — max=300 vs
    // mean=300/8 over the CODEBOOK's k (an occupied-cell mean would
    // read max ≈ mean here and miss the flood), past the 4x skew
    // factor and the 256-row floor
    val blob = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val corpus = (0L until 300L).map(i => (i, blob)).toDF("vec_id", "embedding")
    val ledger = Similarity.semDedupCells(corpus, cent).collect()
    assert(ledger.length == 300)
    assert(SO.lastCellStats.exists { case (cells, mx, mean) =>
      cells == 1L && mx == 300L && math.abs(mean - 37.5) < 1e-9 })
    assert(SO.lastHotCellFlagged, "flooded cell must trip the guard")
    // greedy rule under the flood: vec 0 survives, everyone else is
    // dominated by it
    assert(ledger.count(_.getInt(2) == 1) == 1)
    assert(ledger.filter(_.getInt(2) == 0).forall(_.getLong(3) == 0L))
    // balanced: the same 300 rows spread one-hot across all 8 cells —
    // max ≈ mean, guard quiet
    val spread = (0L until 300L).map { i =>
      val c = (i % 8).toInt
      (i, Array.tabulate(64)(j => if (j == c) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    Similarity.semDedupCells(spread, cent).collect()
    assert(SO.lastCellStats.exists { case (cells, mx, _) =>
      cells == 8L && mx <= 38L })
    assert(!SO.lastHotCellFlagged, "balanced cells must not trip the guard")
    spark.catalog.clearCache()
  }

  test("semDedupCellsAdaptive equals semDedupCells when no cell is hot") {
    val e = graft.Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
    val cent = graft.operators.SimilarityOps.trainedCentroids(e)
    val plain = Similarity.semDedupCells(e, cent).selectExpr(
      "vec_id", "cast(cell as bigint) as cell", "keep_flag", "keeper").collect()
    val adaptive = Similarity.semDedupCellsAdaptive(e, cent).collect()
    assert(plain.nonEmpty)
    assert(sorted(adaptive) == sorted(plain))
    spark.catalog.clearCache()
  }

  test("semDedupCellsAdaptive splits a splittable flood and clears the guard") {
    import spark.implicits._
    val SO = graft.operators.SimilarityOps
    val cent = (0 until 8).map { c =>
      (c, Array.tabulate(64)(i => if (i == c) 1.0f else 0.0f))
    }.toDF("cell", "ce")
    // 320 vectors in 4 tight blobs around e0 (+0.4 on a blob-specific
    // axis): all nearest codebook cell 0 (cos ≈ 0.93) -> one flooded
    // cell; ids interleave blobs so the 4 lowest-id sub-seeds land one
    // per blob
    val corpus = (0L until 320L).map { i =>
      val b = (i % 4).toInt
      (i, Array.tabulate(64)(j =>
        if (j == 0) 1.0f else if (j == 10 + b) 0.4f else 0.0f))
    }.toDF("vec_id", "embedding")
    val ledger = Similarity.semDedupCellsAdaptive(corpus, cent,
      targetCellSize = 100).collect()
    assert(ledger.length == 320)
    // post-split geometry: 4 sub-cells of 80 rows, guard quiet
    assert(!SO.lastHotCellFlagged)
    assert(SO.lastCellStats.exists { case (cells, mx, _) =>
      cells == 4L && mx == 80L })
    // every occupied cell id is synthetic (above the 0..7 codebook)
    val cellsUsed = ledger.map(_.getLong(1)).toSet
    assert(cellsUsed.size == 4 && cellsUsed.forall(_ > 7L))
    // within a blob all vectors are identical -> greedy keeps exactly
    // the lowest id per sub-cell; cross-blob pairs (cos ≈ 0.86) are in
    // separate sub-cells, out of dedup scope by the split's design
    val keepers = ledger.filter(_.getInt(2) == 1)
    assert(keepers.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
    // every dropped row's keeper is its blob's seed (same cell, lower id)
    val cellOf2 = ledger.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ledger.filter(_.getInt(2) == 0).forall(r =>
      r.getLong(3) == r.getLong(0) % 4 &&
        cellOf2(r.getLong(3)) == r.getLong(1)))
    spark.catalog.clearCache()
  }

  test("semDedupCellsAdaptive leaves the flag set on an unsplittable flood") {
    import spark.implicits._
    val SO = graft.operators.SimilarityOps
    val cent = (0 until 8).map { c =>
      (c, Array.tabulate(64)(i => if (i == c) 1.0f else 0.0f))
    }.toDF("cell", "ce")
    // 300 IDENTICAL vectors: no geometry to separate, every split round
    // re-merges them into one sub-cell — maxRounds exhausts and the
    // guard must stay up so the caller learns the quadratic was paid
    val blob = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val corpus = (0L until 300L).map(i => (i, blob)).toDF("vec_id", "embedding")
    val ledger = Similarity.semDedupCellsAdaptive(corpus, cent,
      targetCellSize = 100, maxRounds = 2).collect()
    assert(ledger.length == 300)
    assert(SO.lastHotCellFlagged, "unsplittable flood must keep the flag")
    assert(ledger.count(_.getInt(2) == 1) == 1)
    assert(ledger.filter(_.getInt(2) == 0).forall(_.getLong(3) == 0L))
    spark.catalog.clearCache()
  }

  test("semDedupCellsAdaptive keeps the ledger plan flat across split rounds") {
    import spark.implicits._
    val SO = graft.operators.SimilarityOps
    val cent = (0 until 8).map { c =>
      (c, Array.tabulate(64)(i => if (i == c) 1.0f else 0.0f))
    }.toDF("cell", "ce")
    // 160 vectors, all nearest cell 0, in 8 blobs with SKEWED sizes:
    // blob 0 holds 90 (identical) vectors, blobs 1-7 hold 10 each; ids
    // 0..7 seed one per blob. Round 1 (kc=8) separates the blobs; blob
    // 0's 90-row sub-cell is still over target=20, so round 2 MUST run
    // (identical vectors, so it can't split further — flag stays, which
    // is fine: this test pins the loop's PLAN hygiene, not geometry).
    def blobVec(b: Int) = Array.tabulate(64)(j =>
      if (j == 0) 1.0f else if (j == 10 + b) 0.4f else 0.0f)
    val corpus = ((0L until 8L).map(i => (i, blobVec(i.toInt))) ++
      (8L until 97L).map(i => (i, blobVec(0))) ++
      (97L until 160L).map(i => (i, blobVec(1 + ((i - 97) % 7).toInt)))
    ).toDF("vec_id", "embedding")
    val ledger = Similarity.semDedupCellsAdaptive(corpus, cent,
      targetCellSize = 20, maxRounds = 2)
    assert(ledger.count() == 160)
    assert(SO.lastSplitRounds == 2,
      s"fixture must exercise BOTH rounds, ran ${SO.lastSplitRounds}")
    // the lineage rail: each round references the previous round's plan
    // twice (left_anti + hotMembers), so a persist-only loop DOUBLES
    // the logical plan per round — with the broadcast-codebook agg
    // subtree aboard each copy, four rounds of that OOMed the driver
    // inside AQE's explainString before a single task ran. The eager
    // localCheckpoint cuts each round to a flat scan, so the ledger's
    // analyzed plan stays small and round-count-independent.
    val nodes = ledger.queryExecution.analyzed.collect { case n => n }.length
    assert(nodes <= 80,
      s"ledger plan has $nodes nodes — splitter lineage is compounding " +
        "across rounds (the localCheckpoint per round is gone?)")
    spark.catalog.clearCache()
  }

  test("semDedupIncrement equals gated ss26 and admits only genuinely novel vectors") {
    val e = graft.Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
    val corpus = e.filter(col("vec_id") < 400)
    val batch = e.filter(col("vec_id") >= 400)
    val cent = graft.operators.SimilarityOps.trainedCentroids(corpus)
    val kept = Similarity.semDedupCells(corpus, cent)
      .filter(col("keep_flag") === 1).select("vec_id", "cell")
      .join(corpus.select("vec_id", "embedding"), Seq("vec_id"))
    val api = Similarity.semDedupIncrement(kept, batch, cent).collect()
    val gated = graft.SparkEntry.queries("ss26_semdedup_increment")(spark, sf)
      .collect()
    assert(api.length == batch.count())
    assert(sorted(api) == sorted(gated))
    assert(api.exists(_.getInt(2) == 0), "fixture must exercise the drop arm")
    assert(api.exists(_.getInt(2) == 1), "fixture must exercise the keep arm")
    // incremental contract: every keeper is either a KEPT corpus rep or
    // an earlier batch row — never a dropped corpus row
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(api.filter(_.getInt(2) == 0).forall { r =>
      val k = r.getLong(3)
      keptIds(k) || (k >= 400L && k < r.getLong(0))
    })
    spark.catalog.clearCache()
  }

  test("semDedupTauSweep equals gated ss27 and is consistent with ss25 at tau=0.3") {
    val e = graft.Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
    val cent = graft.operators.SimilarityOps.trainedCentroids(e)
    val api = Similarity.semDedupTauSweep(e, cent).collect()
    val gated = graft.SparkEntry.queries("ss27_semdedup_tau_sweep")(spark, sf)
      .collect()
    assert(api.length == 5)
    assert(sorted(api) == sorted(gated))
    val n = e.count()
    val byTau = api.map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every row partitions the corpus; kept is monotone non-decreasing
    // in tau (a higher threshold never drops more)
    assert(byTau.values.forall { case (d, k) => d + k == n })
    val keptByTau = byTau.toSeq.sortBy(_._1).map(_._2._2)
    assert(keptByTau.zip(keptByTau.tail).forall { case (a, b) => a <= b })
    // the tau=30 row must agree with ss25's ledger at the same codebook
    val ss25Kept = graft.SparkEntry.queries("ss25_semdedup_cells")(spark, sf)
      .filter(col("keep_flag") === 1).count()
    assert(byTau(30)._2 == ss25Kept,
      s"sweep kept ${byTau(30)._2} at tau=30 vs ss25 ledger $ss25Kept")
    spark.catalog.clearCache()
  }

  test("cellGeometry equals gated ss28, flags a flood, accounts for every vector") {
    val e = graft.Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
    val cent = graft.operators.SimilarityOps.trainedCentroids(e)
    val api = Similarity.cellGeometry(e, cent).collect()
    val gated = graft.SparkEntry.queries("ss28_cell_geometry")(spark, sf)
      .collect()
    assert(api.nonEmpty)
    assert(sorted(api) == sorted(gated))
    // sizes partition the corpus; the balanced fixture trips nothing
    assert(api.map(_.getLong(1)).sum == e.count())
    assert(api.forall(_.getInt(2) == 0))
    // flood: 300 identical vectors into one cell of an 8-cell codebook
    // must flag hot=1 on that cell and nothing else (the guard's rule,
    // oracle-shaped: 300 > 256 and 300*8 > 4*300)
    import spark.implicits._
    val cent8 = (0 until 8).map { c =>
      (c, Array.tabulate(64)(i => if (i == c) 1.0f else 0.0f))
    }.toDF("cell", "ce")
    val blob = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val corpus = (0L until 300L).map(i => (i, blob)).toDF("vec_id", "embedding")
    val geo = Similarity.cellGeometry(corpus, cent8).collect()
    assert(geo.length == 1 && geo(0).getInt(0) == 0 &&
      geo(0).getLong(1) == 300L && geo(0).getInt(2) == 1)
    spark.catalog.clearCache()
  }

  test("semDedupSequential equals gated st16") {
    val e = graft.Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
    val api = Similarity.semDedupSequential(
      e, graft.operators.SimilarityOps.trainedCentroids(e)).collect()
    val gated = graft.SparkEntry.queries("st16_stream_semdedup")(spark, sf).collect()
    assert(api.nonEmpty)
    assert(sorted(api) == sorted(gated))
    spark.catalog.clearCache()
  }

  test("bitextMarginMine equals gated ss29; one best candidate per mined A vector") {
    val e = graft.Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
    val api = Similarity.bitextMarginMine(
      e.filter(col("vec_id") % 2 === 0),
      e.filter(col("vec_id") % 2 === 1),
      graft.operators.SimilarityOps.trainedCentroids(e)).collect()
    val gated = graft.SparkEntry.queries("ss29_bitext_margin")(spark, sf).collect()
    assert(api.nonEmpty)
    assert(sorted(api) == sorted(gated))
    // ledger shape: one row per mined A vector, everything positive,
    // cosine never past 1.0 in x1e6 units
    assert(api.map(_.getLong(0)).distinct.length == api.length)
    assert(api.forall(r => r.getLong(2) > 0 && r.getLong(2) <= 1000000L))
    assert(api.forall(_.getLong(3) > 0))
    spark.catalog.clearCache()
  }

  test("bitextMarginMine ranks a mutually-exceptional pair above a dense-region pair") {
    import spark.implicits._
    // 8-cell one-hot codebook; everything below lands in cell 0
    val cent = (0 until 8).map { c =>
      (c, Array.tabulate(64)(i => if (i == c) 1.0f else 0.0f))
    }.toDF("cell", "ce")
    def v(axis: Int, w: Float) =
      Array.tabulate(64)(j => if (j == 0) 1.0f else if (j == axis) w else 0.0f)
    // ids 0 (A) and 1 (B): a true pair — identical off-axis tilt, so
    // cos(0,1)=1 while each is merely ~0.958 to the dense blob.
    // ids 2,4 (A) and 3,5 (B): a dense region — all exactly e0, every
    // cross pair cos=1, so nothing about any one pair is exceptional.
    val rows = Seq(
      (0L, v(11, 0.3f)), (1L, v(11, 0.3f)),
      (2L, v(0, 0f)), (3L, v(0, 0f)), (4L, v(0, 0f)), (5L, v(0, 0f)))
    val df = rows.toDF("vec_id", "embedding")
    val mined = Similarity.bitextMarginMine(
      df.filter(col("vec_id") % 2 === 0),
      df.filter(col("vec_id") % 2 === 1), cent)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    // the true pair is found and out-margins every dense-region pair —
    // the criterion's whole point: raw cosine alone (1.0 everywhere
    // here) cannot make that separation
    assert(mined(0L)._1 == 1L)
    assert(mined(2L)._1 == 3L) // tie among identical candidates → lowest id
    assert(mined(0L)._2 > mined(2L)._2,
      s"true-pair margin ${mined(0L)._2} must exceed dense-region ${mined(2L)._2}")
    assert(mined(0L)._2 > 1000000L, "mutually-exceptional pair must clear margin 1.0")
    spark.catalog.clearCache()
  }

  test("semanticDedup over srpNearDup pairs merges every SRP pair") {
    // the no-blocking-key scale path: SRP candidates -> CC -> keep set.
    // Different pair generator than gated dd14, so compare invariants,
    // not rows: partition of the corpus, no pair left intact.
    val e = graft.Tables.embeddings(spark, sf)
    val pairs = Similarity.srpNearDup(e, "vec_id", "embedding")
    val keep = Similarity.semanticDedup(e, "vec_id", pairs).collect()
    assert(keep.map(_.getLong(1)).sum == e.count())
    val keeps = keep.map(_.getLong(0)).toSet
    val pc = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pc.nonEmpty)
    assert(pc.forall { case (a, b) => !(keeps(a) && keeps(b)) })
    spark.catalog.clearCache()
  }

  test("ivfTopK equals the gated ss05 nprobe=2 query") {
    val e = graft.Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
    val api = Similarity.ivfTopK(
      e, "vec_id", "embedding",
      centroids = graft.operators.SimilarityOps.labelCentroids(e),
      queryPred = col("vec_id") < 5, k = 3, nprobe = 2).collect()
    val gated = graft.SparkEntry.queries("ss05_ann_nprobe2")(spark, sf).collect()
    assert(api.nonEmpty)
    assert(sorted(api) == sorted(gated))
    spark.catalog.clearCache()
  }

  test("ivfTopK resolves the query predicate against the caller's column names") {
    // regression: the pred references the USER's id column; the internal
    // rename to vec_id/embedding must not break resolution
    val e = graft.Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
    val renamed = e.select(col("vec_id").as("id"), col("label"),
      col("embedding").as("emb"))
    val api = Similarity.ivfTopK(
      renamed, "id", "emb",
      centroids = graft.operators.SimilarityOps.labelCentroids(e),
      queryPred = col("id") < 5, k = 3, nprobe = 2).collect()
    val gated = graft.SparkEntry.queries("ss05_ann_nprobe2")(spark, sf).collect()
    assert(sorted(api) == sorted(gated))
    spark.catalog.clearCache()
  }

  test("semanticDedup with an empty pair graph keeps every row") {
    import spark.implicits._
    val corpus = (1L to 10L).map(i => (i, i)).toDF("vec_id", "payload")
    val noPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val keep = Similarity.semanticDedup(corpus, "vec_id", noPairs).collect()
    assert(keep.length == 10)
    assert(keep.forall(_.getLong(1) == 1L), "all singletons")
  }

  test("semanticContamination equals the gated ss12 hit list and is cross-set") {
    val e = graft.Tables.embeddings(spark, sf)
    val api = Similarity.semanticContamination(
      e.filter(col("vec_id") < 100), e.filter(col("vec_id") >= 100),
      "vec_id", "embedding").collect()
    val gated = graft.SparkEntry.queries("ss12_semantic_contamination")(spark, sf)
      .collect()
    assert(sorted(api) == sorted(gated))
    assert(api.forall(r => r.getLong(0) < 100 && r.getLong(1) >= 100),
      "every hit pairs a benchmark id with a train id")
    spark.catalog.clearCache()
  }

  test("jlProject emits deterministic 16-dim projections preserving dot sign structure") {
    val e = graft.Tables.embeddings(spark, sf)
    val out = Similarity.jlProject(e, "embedding")
    val rows = out.selectExpr("vec_id", "projected").collect()
    assert(rows.length == e.count())
    assert(rows.forall(_.getSeq[Double](1).length == 16))
    // deterministic across reruns and partitionings
    val again = Similarity.jlProject(e.repartition(7), "embedding")
      .selectExpr("vec_id", "projected").collect()
    assert(rows.map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap ==
      again.map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap)
    // JL property (statistical): E[‖y‖²] = outDim·‖x‖² for a ±1 sign
    // matrix — per-vector ratio concentrates near 1, mean within ±30%
    val ratios = out.selectExpr(
      "aggregate(projected, cast(0 as double), (a, v) -> a + v * v) as pn",
      "aggregate(embedding, cast(0 as double), (a, v) -> a + cast(v as double) * cast(v as double)) as en")
      .collect().map(r => r.getDouble(0) / (16.0 * r.getDouble(1)))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"norm-ratio mean $mean outside JL band")
  }

  test("jlProject rejects a widening projection") {
    val e = graft.Tables.embeddings(spark, sf)
    val ex = intercept[IllegalArgumentException] {
      Similarity.jlProject(e, "embedding", inDim = 16, outDim = 64)
    }
    assert(ex.getMessage.contains("outDim"))
  }

  test("kmeans separates two exact blobs with zero SSE") {
    import spark.implicits._
    val a = Array.tabulate(64)(i => if (i == 0) 2.0f else 0.0f)
    val b = Array.tabulate(64)(i => if (i == 1) 2.0f else 0.0f)
    // ids alternate blobs so the two seeds (ids 0, 1) land one per blob
    val df = (0L until 10L).map(i => (i, if (i % 2 == 0) a else b)).toDF("id", "emb")
    val out = Similarity.kmeans(df, "id", "emb", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(out.toSeq == Seq((0L, 5L, 0.0), (1L, 5L, 0.0)))
  }

  test("kmeans drops an empty cell instead of re-seeding") {
    import spark.implicits._
    // both seeds identical -> every row ties -> the smaller cell takes
    // all members, the other goes empty and must vanish from the output
    val v = Array.tabulate(64)(_ => 1.0f)
    val df = (0L until 8L).map(i => (i, v)).toDF("id", "emb")
    val out = Similarity.kmeans(df, "id", "emb", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0L, 8L, 0.0)))
  }

  test("kmeans is invariant under repartitioning (plan-literal codebook)") {
    val e = graft.Tables.embeddings(spark, sf)
    val base = Similarity.kmeans(e).collect()
    val repart = Similarity.kmeans(e.repartition(7)).collect()
    assert(base.nonEmpty)
    assert(sorted(base) == sorted(repart))
  }

  test("cosineTopK equals the gated ss01 top-5") {
    val e = graft.Tables.embeddings(spark, sf)
    val api = Similarity
      .cosineTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .select("q_id", "rank", "n_id").collect()
    val gated = graft.SparkEntry.queries("ss01_topk_cosine")(spark, sf).collect()
    assert(api.length == 25)
    assert(sorted(api) == sorted(gated))
    spark.catalog.clearCache()
  }

  test("hybridTopK: RRF fusion arithmetic holds row-by-row and API ≡ gated ss17") {
    val docs = graft.Tables.documents(spark, sf)
    val e = graft.Tables.embeddings(spark, sf)
    val api = graft.functions.Similarity.hybridTopK(docs, e).collect()
    assert(api.length == 20)
    api.foreach { r =>
      val (lex, den, rrf) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(den >= 1, "dense arm ranks every candidate")
      val expect = (if (lex > 0) 1000000L / (60L + lex) else 0L) +
        1000000L / (60L + den)
      assert(rrf == expect, s"rrf mismatch for doc ${r.getLong(0)}")
    }
    // a doc present in both arms at equal rank dominates one ranked the
    // same dense-only — fusion actually fuses
    assert(api.exists(_.getLong(1) > 0), "no doc matched any query term")
    val gated = graft.SparkEntry.queries("ss17_rrf_hybrid")(spark, sf).collect()
    assert(sorted(api) == sorted(gated))
  }

  test("hammingTopK with a full-corpus shortlist equals exact cosineTopK") {
    val e = graft.Tables.embeddings(spark, sf)
    val n = e.count().toInt
    val q = e.filter(col("vec_id") < 5)
    // shortlist covers the whole corpus -> the Hamming stage filters
    // nothing and the rerank IS brute-force cosine
    val bq = Similarity.hammingTopK(e, q, "vec_id", "embedding",
        k = 3, shortlist = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bq == exact)
    assert(bq.nonEmpty)
  }

  test("hammingTopK is dimension-parametric: 32-dim vectors, one code word") {
    import spark.implicits._
    // group A all-positive, group B sign-flipped on odd dims: Hamming
    // separates the groups perfectly, so with shortlist < group size the
    // shortlist stays within the query's own group
    val a = Array.tabulate(32)(i => 0.1f + i * 0.01f)
    val b = Array.tabulate(32)(i => if (i % 2 == 1) -0.1f - i * 0.01f else 0.1f + i * 0.01f)
    val df = ((0L until 6L).map(i => (i, a)) ++ (6L until 12L).map(i => (i, b)))
      .toDF("id", "emb")
    val res = Similarity.hammingTopK(df, df.filter(col("id") === 0), "id", "emb",
        k = 5, shortlist = 5, dim = 32)
      .collect().map(_.getLong(2)).toSet
    assert(res == Set(1L, 2L, 3L, 4L, 5L)) // group A only, never group B
  }

  test("novelty API equals the gated tx22 query") {
    val docs = graft.Tables.documents(spark, sf)
    val api = Dedup.novelty(docs).collect()
    val gated = graft.SparkEntry.queries("tx22_ngram_novelty")(spark, sf).collect()
    assert(api.nonEmpty)
    assert(sorted(api) == sorted(gated))
  }

  test("tokenBudget API equals the gated cu10 query and is budget-exact at odd budgets") {
    val docs = graft.Tables.documents(spark, sf)
    val api = Curation.tokenBudget(docs).collect()
    val gated = graft.SparkEntry.queries("cu10_token_budget")(spark, sf).collect()
    assert(sorted(api) == sorted(gated))
    // a budget that forces remainder distribution still sums exactly
    val odd = Curation.tokenBudget(docs, budget = 99991L).collect()
    assert(odd.map(_.getLong(3)).sum == 99991L)
  }

  test("cdcChunks API equals the gated dd24 query") {
    val docs = graft.Tables.documents(spark, sf)
    val api = Dedup.cdcChunks(docs).collect()
    val gated = graft.SparkEntry.queries("dd24_cdc_chunks")(spark, sf).collect()
    assert(api.nonEmpty)
    assert(sorted(api) == sorted(gated))
  }

  test("passageNearDup API on the augmented frame equals the gated dd23 query") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf)
    val aug = docs.filter(col("doc_id") % 5 === 0)
      .selectExpr("doc_id",
        "concat(lower(text), " +
          "repeat(' pad', (8 - size(split(lower(text), '\\\\s+')) % 8) % 8), " +
          "' shared boilerplate sentence about usual terms conditions v', " +
          "cast(doc_id % 7 as string)) as text")
      .unionAll(docs.filter(col("doc_id") % 5 =!= 0)
        .selectExpr("doc_id", "lower(text) as text"))
    val api = Dedup.passageNearDup(aug).collect()
    val gated = graft.SparkEntry.queries("dd23_passage_neardup")(spark, sf).collect()
    assert(api.nonEmpty)
    assert(sorted(api) == sorted(gated))
    spark.catalog.clearCache()
  }
}
