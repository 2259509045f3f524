package graft.tools

import graft.metrics.StageMetricsListener
import org.apache.spark.sql.SparkSession

/** Emits SCALE.md — measured per-query byte flows (input read, shuffle
  * write, spill) at a given scale factor, as evidence for the repo's
  * scale claims: dedup/LSH queries must shuffle KILOBYTES of signatures
  * while reading MEGABYTES of text, aggregations must combine map-side
  * (shuffle ≪ input), and nothing may spill at fixture scale. The shuffle
  * ratio is the number that survives a 1000× scale-up: bytes crossing the
  * network per byte read is invariant in the data size for these plans.
  *
  *   sbt 'runMain graft.tools.ShuffleAudit [sfDir] [outFile]'
  */
object ShuffleAudit {

  // queries whose shuffle behavior carries the scale argument, with the
  // claim the measurement should support
  private val audited: Seq[(String, String)] = Seq(
    "q1_pricing_summary" -> "map-side combine: shuffle ≪ input",
    "q5_nation_revenue" -> "dims broadcast; one fact shuffle",
    "q_salted_join" -> "salting splits hot keys; no spill",
    "q_bloom_prefilter" -> "bloom drops non-matching rows pre-shuffle",
    "q_partition_prune" -> "partition pruning: input ≪ full table",
    "dd01_exact_dedup" -> "digests shuffle, text does not",
    "dd04_lsh_candidate_pairs" -> "only (band, bucket, doc_id) shuffles; buckets past 64 skipped",
    "dd10_simhash_neardup" -> "signatures + capped pair volume, never text",
    "dd12_contamination" -> "only 60-bit shingle hashes shuffle",
    "ss02_ann_ivf" -> "centroids broadcast; assignments shuffle",
    "tx01_langid" -> "pure scan projection: zero shuffle",
    "ss07_dim_stats" -> "one-pass agg: shuffle is a few partial rows",
    "ss09_pq_recall" -> "training ranks only the 20% sample; cuts/codebook broadcast; ADC combines map-side",
    "ss10_srp_neardup" -> "planes are plan literals; only (vec_id, band, key) longs shuffle",
    "dd14_semantic_dedup" -> "block join caps pair fan-out; CC rounds shuffle (id, label) longs only",
    "cu01_curation_ledger" -> "signal projections share a scan (banding scans once more); only digest/label longs shuffle",
    "tx11_winnow_fingerprints" -> "winnow selection entirely inside the scan projection: zero shuffle",
    "tx12_winnow_overlap" -> "fp set + cap-bounded pair rows shuffle (linear under floods); text never does",
    "tx13_gopher_rules" -> "pure scan projection: zero shuffle",
    "sm04_mixture_weights" -> "per-source ppm broadcasts back; the fact table never shuffles",
    "cu02_adaptive_quality" -> "one exchange of (id, source, score); stacked windows share it",
    "ss12_semantic_contamination" -> "cross-set banding: only (id, band, key) longs shuffle, per-side caps",
    "dd15_incremental_neardup" -> "anti-join shaped: corpus reduces to distinct band keys, no pair enumeration",
    "cu03_full_ledger" -> "all per-row signals in one scan projection; digest/source/count exchanges only",
    "tx16_bigram_fluency" -> "token-level shuffles (counts + occurrence joins), linear in corpus; text never shuffles",
    "sm05_dsir_weights" -> "bucket tables (≤1024 rows) broadcast back; tokens never shuffle, per-doc sums combine map-side",
    "tx17_pii_redact" -> "pure scan projection (regex count + replace): zero shuffle",
    "dd17_passage_boilerplate" -> "only (doc_id, i, ntok, hash) longs shuffle; passage text hashed in the scan and dropped",
    "dd18_dup_spans" -> "stride-1 window hashes: (doc_id, i, hash) longs shuffle, linear in tokens; span merge is one doc-sharded int window",
    "cu05_domain_filter" -> "pure scan projection (regex extract + literal IN): zero shuffle",
    "sm06_fluency_buckets" -> "bigram-LM count aggs + one (id, source, score) tercile window; text never shuffles",
    "tx18_trigram_backoff" -> "vocab-bounded n-gram count tables, token-key joins; text never shuffles",
    "ss14_jl_recall" -> "projection born in the scan (16 literal dots); ranking shuffles only (q_id, n_id, score) rows",
    "cu06_classifier_filter" -> "pure scan projection (integer logit): zero shuffle",
    "q_bucket_join" -> "bucketed tables co-locate the join: only the final group-by exchanges",
    "ss15_kmeans_lloyd" -> "codebook enters as plan literals: assignment never shuffles the corpus; k-row centroid aggs combine map-side",
    "an10_heavy_hitters" -> "token counts combine map-side to vocab rows; the total broadcasts back into the threshold filter",
    "sm07_temperature_mix" -> "two tiny group aggs + broadcast total; the corpus never shuffles",
    "st06_running_total" -> "one user_id exchange feeds both running windows; money stays decimal-exact",
    "mm06_frame_sample" -> "pure scan projection + explode (seek arithmetic): zero shuffle",
    "tx19_bm25" -> "tf rows exist only for query terms (IN pushed into the scan); df + (L,N) broadcast back; top-k is a 20-row sort",
    "an11_zipf_octaves" -> "vocab-bounded count table; rank rides the distributed Ordinal on -freq (quantile buckets + broadcast offsets, no single-partition window), octave rollup ≤ 64 rows; text never shuffles",
    "an12_constraint_audit" -> "per-table rules share one map-side agg pass; RI rules shuffle key columns only",
    "sm08_poisson_ht" -> "keep decision + HT mass are scan-local projections; only the per-source rollup exchanges",
    "q_scd2_history" -> "ONE user_id exchange feeds change-detection lag, version numbering, and close-off lead",
    "ss16_range_search" -> "cell stats + query×cell bounds are broadcast-tiny; only survivor cells' members flow into the keyed join",
    "st07_sliding_window" -> "4x window expansion partial-aggregates map-side; shuffle carries (window, type) partials, not events",
    "st08_abandoned_clicks" -> "(user, time-block) keyed candidates bound fan-out; anti join exchanges click ids only",
    "tx20_mojibake_repair" -> "pure scan projection (literal replace chain): zero shuffle",
    "dd19_url_dedup" -> "canonicalization fuses into the scan; only short canonical-URL strings + ids exchange, text never moves",
    "cu07_mixture_rebalance" -> "digest window shuffles 60-bit longs; per-source rollup partial-aggregates to one row per source, weights broadcast",
    "dd20_soft_weights" -> "dd08's (id, label)-long CC exchanges plus ONE per-cluster count window; text never shuffles",
    "cu08_cluster_split" -> "split is a scan-local hash of the CC label; nothing beyond dd08's (id, label) longs shuffles",
    "ss17_rrf_hybrid" -> "each arm reduces to (id, score) longs, then ranks on the distributed quantile-bucketed ordinal (no single-partition window); fusion joins ids, top-k is a 20-row sort",
    "sm09_universe_sample" -> "membership is a scan-local key hash on both sides; truth + estimate share one broadcast join pass",
    "an13_value_drift" -> "extrema broadcast back; bin assignment scan-local; 10-bin rollup combines map-side",
    "q_zorder_layout" -> "Z-values born in the scan; the file cut is the range exchange any sorted write pays",
    "tx21_code_detect" -> "pure scan projection (translate-delta counting): zero shuffle",
    "mm07_image_ahash" -> "decode + hash partition-local; the Hamming chain runs banded (doc_id div 16) with a two-level boundary stitch — only the n/16384-row block rollup crosses an unpartitioned window",
    "dd21_containment" -> "dd06's shape: overlap join on 60-bit shingle hashes, capped candidates, text never shuffles",
    "sm10_neyman_allocation" -> "one map-side moment agg per stratum; allocation runs on the tiny aggregate, totals broadcast",
    "an14_funnel" -> "three keyed min-aggs + user-keyed joins of (id, ts) longs; output is O(#stages)",
    "st09_late_events" -> "one user-keyed exchange of (id, ts) longs; running max is a per-key window",
    "ss18_nprobe_sweep" -> "ONE persisted scored frame (N×3 rows) feeds assignment and probes; the three arms stack as a column (r19) — one candidate join + one window rank all of them",
    "cu09_dedup_provenance" -> "one (id, label) rollup past the CC rounds; dropped lists capped at 16 ids",
    "q_incr_merge" -> "base + delta each map-side combine; the merge joins key-count rows of decimal state",
    "fn11_count_vector" -> "vocab is a 16-row broadcast; vectors assemble in the scan projection",
    "an15_join_cardinality" -> "the probe costs two key-count aggs + a key-row join — far below the join it sizes",
    "mm08_ahash_neardup" -> "decode partition-local; only (doc_id, band, key) and two hash longs per doc shuffle",
    "sm11_neyman_execute" -> "allocation broadcast back; one per-stratum rank window of (id, hash) longs",
    "dd22_lsh_scurve" -> "the 8-component signature rides the band rows as one array (r19) — no join back to a signature frame; the m-histogram rolls to ≤ 9 rows",
    "st10_watermark_curve" -> "four delays share ONE user-keyed running-max window; rollup is a 4-row conditional agg",
    "q_cdc_compact" -> "one key-partitioned rank window — the same exchange the upsert write itself pays",
    "ss19_hamming_rerank" -> "BQ sign codes born in the scan; shortlist ships (q_id, n_id, ham) rows, exact rerank reads 50 vectors/query",
    "ss20_shortlist_sweep" -> "ONE persisted Hamming shortlist feeds all three rerank arms",
    "tx22_ngram_novelty" -> "window hashes born in the scan; first-seen rollup + flag join ship (hash, id) longs only",
    "mm09_vad_segments" -> "windowed energy is a per-doc projection; segment merge is one doc-sharded int window",
    "cu10_token_budget" -> "map-side rollup to source rows; apportionment windows run on the tiny frame",
    "an16_token_tv_drift" -> "vocab-bounded count table; totals broadcast back; top-40 is a vocab-row sort",
    "st11_stream_dedup" -> "one (id, longs) exchange with map-side combine; dedup state bounded by the watermark horizon",
    "st12_session_window" -> "one user-keyed exchange; open-session state exists only in the streaming twin",
    "q_file_compaction" -> "metadata-only: one rollup to manifest cardinality; the first-fit running total rides withGlobalPrefixSum (bucketed partial sums + broadcast offsets) — a million-file manifest never funnels one partition",
    "st13_window_topk" -> "counts partial-aggregate to (window × type) rows; rank orders type-cardinality frames",
    "ss21_mrl_recall" -> "4 truncation arms ride one exploded pass against broadcast queries — one corpus scan",
    "an17_kmv_cardinality" -> "distinct (source, hash) combines map-side to vocab rows; rank window orders the vocab frame",
    "an18_ks_drift" -> "per-(source, value) counts combine map-side; per-source CDFs window partitioned by source, the corpus CDF rides withGlobalPrefixSum — no single-partition window over the value domain",
    "tx23_readability" -> "pure scan projection (counts + integer Flesch): zero shuffle",
    "cu11_curriculum" -> "one source-keyed exchange carries both windows; only (id, score, ntok) longs",
    "cu12_curation_funnel" -> "cu01's exchanges plus ONE map-side conditional agg to a single row",
    "sm12_bootstrap_ci" -> "32× replica expansion combines map-side to (source × B) partials; rank windows order 32-row frames",
    "q_mor_deletes" -> "delete keys broadcast against the base; the audit rolls up map-side to manifest cardinality",
    "mm10_stereo_downmix" -> "pure scan projection (two HOF folds): zero shuffle",
    "dd23_passage_neardup" -> "passage text hashed in the scan; the sig long RIDES the band rows (r19), so the verify is a projection on the pair join — no join back, Hamming filtered before the distinct; bytes here are the two full-row (band, v) window exchanges that replaced the bucket-sizing join-back (whose sized table is bucket-cardinality — a broadcast cliff at scale), linear and spill-free at the 100x smoke",
    "cu13_dataset_card" -> "every signal in ONE scan projection; the single global agg (count-distinct digest included) combines map-side",
    "dd24_cdc_chunks" -> "boundary scan + chunk slicing are HOFs inside the scan; only (doc_id, idx, pos, len, hash) rows leave it",
    "ss22_index_staleness" -> "centroids broadcast; scored pass scan-local; per-cell rollup combines map-side to codebook cardinality",
    "sm13_temporal_split" -> "one user-keyed min-agg; the median rank rides the distributed Ordinal over the entity-cardinality frame (r12's one scale-killer, fixed); cutoff broadcasts back",
    "cu15_equal_mass_shards" -> "corpus-frame running mass rides withGlobalPrefixSum: only (doc_id, n_chars) longs shuffle on the bucket key, text never does; total broadcasts, rollup is 8 rows",
    "sm14_priority_sample" -> "priorities born in the scan; TakeOrdered(k+1) ships per-partition top-(k+1) partials — k+1 rows cross the network at ANY corpus size, τ broadcasts back",
    "cu16_equal_mass_export" -> "physical export: assignment rides cu15's prefix-sum path ((doc_id, n_chars) longs), an assignment→text join (broadcast here; a second corpus-byte exchange at 100 TB — see the 100x subset smoke), then the terminal shard_id exchange (identity partitioner) carries the record bytes to the 8 writer tasks; the audit scans the export ONCE (r15: the grand total derives from the 8-row rollup via a window over it, not a second shard read)",
    "cu17_curriculum_export" -> "ordered export: cu11's source-keyed curriculum windows ((id, score, ntok) longs), an assignment→text join (broadcast here; a second corpus-byte exchange at 100 TB — see the 100x subset smoke), then repartitionAndSortWithinPartitions places the record bytes — the reduce side merges SPILLED sorted runs, so within-shard sort never holds a shard in task memory",
    "cu18_export_manifest" -> "manifest audit: pays cu16's export once; the manifest itself is numShards lines of driver-bounded metadata (one stats row per writer task), so the audit adds ZERO shuffle beyond the export it audits",
    "cu19_sequence_packing" -> "running token total rides withGlobalPrefixSum ((doc_id, ntok) longs on the bucket key — text never shuffles); seq ids are scan-local, both rollups partial-aggregate map-side",
    "op11c_reservoir_det" -> "deterministic reservoir: positions ride stream-sharded windows ((key, pos) longs — one exchange); the hash draw + slot filter run scan-side, so only the ≤ k·streams surviving slot writes reach the max_by agg, which partial-aggregates map-side (r16)",
    "sm15_epoch_shuffle" -> "each epoch's permutation rank rides the distributed Ordinal over (hash, doc_id) longs — 3 bucket-keyed exchanges, never a single-partition row_number; rollup is one row per epoch; the base (doc_id) projection persists once so 3 epochs cost ONE corpus read (r15)",
    "cu20_epoch_ordered_export" -> "epoch-ordered export: the epoch-1 permutation rank rides the distributed Ordinal ((hash, doc_id) longs), then ONE repartitionAndSortWithinPartitions exchange places the record bytes into contiguous permutation-block shards (spilled merge sort — no shard held in task memory); the order gate scans the export once, rollup combines map-side to 8 rows",
    "ss23_ranking_metrics" -> "queries broadcast; the scored pass reduces to (q_id, rank, relevant) rows before the per-query rollup",
    "q_csv_roundtrip" -> "sink+source edge format: no pushdown/pruning by design — the measured contrast to op01's parquet scan",
    "an19_kmv_merge" -> "each side reduces to ≤ k longs per source before the merge; rank windows order k-row frames",
    "mm11_image_dhash" -> "decode + hash partition-local; banded Hamming chain + two-level boundary stitch (mm07's shape) — only the n/16384-row block rollup crosses an unpartitioned window",
    "cu14_source_cards" -> "same one-scan projection as cu13; grouped agg partial-aggregates map-side to source rows",
    "dd25_chunk_dedup" -> "chunks reduce to (hash, len) longs before the rollup; per-hash agg combines map-side; ONE output row",
    "tx25_nfc_normalize" -> "native codegen Expression in the scan projection (isNormalized fast path): zero shuffle",
    "st14_window_distinct" -> "counts combine map-side; the distinct (window, hash) frame reduces to users-per-window rows before the rank window",
    "ss24_filtered_ann" -> "centroids broadcast; ONE scored pass feeds assignment + probes; the label filter drops candidates before exact-cosine work",
    "dd26_saved_labels_audit" -> "cluster-once/audit-many: this row pays the one-time label write; the audit-alone scan is measured in the cluster-once section below",
    "dd27_incremental_labels" -> "adoption is a bucket rollup, not a pair stage: corpus reduces to (band, h, label) longs; the batch ships 4 band keys/doc",
    "an20_cms_frequency" -> "sketch built FROM the vocab-bounded count frame (one tokenize); 4× fan-out collapses map-side to ≤ 2048 cells; lookup is a broadcast join",
    "an21_cms_merge" -> "per-shard grids collapse map-side to ≤ d·w cells before the cell-wise merge; probes are 80-row broadcast joins",
    "an22_sample_quantiles" -> "one (source, value, hash) exchange; rank windows order per-source frames, estimates come from k-row samples",
    "an23_quantile_merge" -> "each side reduces to ≤ k (h, value) rows per source before the merge; every window past the cut orders k-row frames",
    "q_jsonl_roundtrip" -> "sink+source edge format like CSV: line-splittable reads, no pushdown by design",
    "ss25_semdedup_cells" -> "codebook broadcasts into ONE scored assignment pass; the pair stage exchanges cell-keyed (id, vector) rows — per-cell quadratic bounded by max cell size under the k∝N contract (hot-cell guard: SimilarityOps.lastCellStats)",
    "ss26_semdedup_increment" -> "incremental ingest: only kept corpus reps enter the cell-keyed join (the corpus never rescans); the batch pays one scored pass + a cell-bounded self-join — cost scales with the batch, not the corpus",
    "ss27_semdedup_tau_sweep" -> "ONE pair pass shared by every τ arm: max(cs) partial-aggregates map-side so the post-pair exchange is ≤ N slim (id, double) rows; the τ grid is a broadcast literal and the rollup is |τ| rows",
    "ss28_cell_geometry" -> "pre-flight before the pair stage: broadcast-scored assignment + k-row cell rollup, hot rule by integer cross-multiply — no pair join, no quadratic anywhere",
    "st16_stream_semdedup" -> "sequential SemDeDup over 4 ingest batches on ONE persisted assignment: per level a cell-keyed kept-side join + a within-batch self-join, both bounded by the k∝N cell contract; the streaming twin's state is the kept reps per cell. NOTE: reads 0 B at the r19 HEAD because the per-level lazy localCheckpoint truncates lineage — the audited final plan is a union of checkpoint block scans; the per-level exchange bytes are carried by the bench/probe rows instead",
    "ss29_bitext_margin" -> "A×B never forms: cross-side pairs are cell-keyed (k∝N-bounded); k-NN averages are per-vector windows over the ONE persisted pair frame; margin is row-local integer arithmetic on a three-way id join",
    "q_tfrecord_roundtrip" -> "native TFRecord sink+source: shards are the read-parallelism unit (one binaryFile task per shard), records stream sequentially within a shard with both CRCs verified — TFRecordDataset's own contract",
    "fn12_tfexample_roundtrip" -> "Example encode/parse are per-record byte arithmetic inside Dataset maps — no driver, no exchange before the final 6-row rollup; the TFRecord shards carry the parallelism",
    "mm12_imagenet_ingest" -> "TFRecord→Example→PNG-decode all partition-local (Dataset maps over binaryFile shards); the only exchange is the 10-row label rollup — the imagenet_input path with zero shuffle before the agg",
    "fn13_varlen_roundtrip" -> "variable-length int64 features (token-length lists) encode/parse partition-local; the output is per-document, so there is NO exchange at all — ingest of sequence features is pure scan work",
    "fn14_wmt_ingest" -> "the composed GNMT text chain: one corpus scan, vocab broadcast as one sorted array (lookup inside the scan projection), ONE bucket exchange that the batch-max window reuses (plan-pinned) — padded_batch costs a sort, never a second corpus shuffle",
    "mm13_ssd_ingest" -> "the composed detection chain: TFRecord→Example(VarLen boxes)→PNG-decode→per-box crop all partition-local Dataset maps; output is per-box rows, so there is NO exchange at all")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "SCALE.md"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val byName = graft.SparkEntry.all.map(q => q.name -> q).toMap
    def fmt(b: Long): String =
      if (b >= (1L << 20)) f"${b / 1048576.0}%.1f MiB"
      else if (b >= 1024) f"${b / 1024.0}%.1f KiB"
      else s"$b B"

    // Bytes ADDRESSED by the plan's parquet scans after partition pruning
    // (ScanFileListing.totalFileSize) — the task-metric bytesRead counter
    // under-reports for codegen'd parquet scans, and the addressed size is
    // the honest denominator for a scale claim anyway. Walks AQE stages,
    // cached-relation plans, and subqueries. Distinct (table, partition
    // filter) scans are counted ONCE even when they appear under several
    // consumers: the multi-consumer queries here persist the derived
    // table, so the file is physically read once — per-appearance
    // counting would inflate the denominator and flatter the ratio.
    def scannedBytes(plan: org.apache.spark.sql.execution.SparkPlan): Long = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[(String, Long)] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case i: InMemoryTableScanExec => walk(i.relation.cachedPlan)
        case f: FileSourceScanExec =>
          val key = f.relation.location.rootPaths.mkString(",") +
            "|" + f.partitionFilters.mkString(",")
          Seq(key -> f.selectedPartitions.totalFileSize)
        case other =>
          other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
      }
      walk(plan).distinctBy(_._1).map(_._2).sum
    }

    val sb = new StringBuilder
    sb ++= s"# Measured byte flows ($sfDir, local[8])\n\n"
    sb ++= "Generated by `graft.tools.ShuffleAudit`: scan bytes from the\n"
    sb ++= "executed plan's file listings (post partition-pruning), shuffle\n"
    sb ++= "and spill from Spark TaskMetrics. `shuffle/scan` is the\n"
    sb ++= "scale-relevant number: what crosses the network per byte\n"
    sb ++= "addressed when the same plan runs on 1000 executors at 100 TB.\n\n"
    sb ++= "| query | scan bytes | shuffle write | spill | shuffle/scan | claim |\n"
    sb ++= "|---|---|---|---|---|---|\n"
    audited.foreach { case (name, claim) =>
      val q = byName(name)
      val l = new StageMetricsListener
      val df = q.fn(spark, sfDir)
      l.collect(spark) {
        df.write.format("noop").mode("overwrite").save()
      }
      val input = scannedBytes(df.queryExecution.executedPlan)
      spark.sharedState.cacheManager.clearCache()
      val ratio =
        if (input > 0) f"${l.shuffleWriteBytes.toDouble / input}%.4f"
        else "n/a"
      sb ++= s"| $name | ${fmt(input)} | ${fmt(l.shuffleWriteBytes)} " +
        s"| ${fmt(l.spillBytes)} | $ratio | $claim |\n"
    }
    sb ++= "\ntx12's 23.9× ratio was re-examined (VERDICT r5 #6, `graft.tools.Tx12Diet`):\n"
    sb ++= "a weighted distinct-doc-list variant (emit each bucket's pairs once per\n"
    sb ++= "DISTINCT doc list with a multiplicity weight) measured **+7.8% shuffle**\n"
    sb ++= "and flat wall at sf0.1 — doc lists repeat too rarely to pay for the extra\n"
    sb ++= "list exchange — so the shipped formulation stands. The bytes are the\n"
    sb ++= "(doc_id, fp) set itself: ~0.25 fps/char × ~48 B/row ≈ 12 B shuffled per\n"
    sb ++= "char of text vs ~1.2 B/char of compressed scan — a density CONSTANT,\n"
    sb ++= "linear in corpus size, not a scale cliff.\n"

    // Template-flood fixture: the corpus plus 300 copies of one document
    // — the boilerplate case that makes uncapped LSH pairing quadratic.
    // Measures the CAPPED queries against an UNCAPPED r=1 banding baseline
    // built from the same dd03 signature machinery, so the table shows the
    // cap (and dd08's star edges) actually bounding the blowup.
    val floodN = 300
    val floodDir = java.nio.file.Files.createTempDirectory("graft-flood").toString
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val template = docs.orderBy("doc_id").limit(1).select("text").head().getString(0)
    import org.apache.spark.sql.functions.{lit, col}
    docs.union(
      spark.range(1000000L, 1000000L + floodN)
        .select(col("id").as("doc_id"), lit(template).as("text")))
      .write.mode("overwrite").parquet(s"$floodDir/documents.parquet")

    sb ++= "\n## Template-flood fixture (corpus + " + floodN +
      " copies of one doc)\n\n"
    sb ++= "Uncapped r=1 banding on this fixture would enumerate ≥ " +
      s"${floodN.toLong * (floodN - 1) / 2} pairs from the flooded\n"
    sb ++= "buckets alone. The capped queries stay at organic volume; dd08's\n"
    sb ++= "star edges keep the flood as one cluster at linear edge cost.\n\n"
    sb ++= "| query | rows (plain) | rows (flooded) | shuffle write | spill | claim |\n"
    sb ++= "|---|---|---|---|---|---|\n"
    val floodAudited = Seq(
      "dd04_lsh_candidate_pairs" ->
        "over-cap buckets skipped: flood adds ZERO pairs",
      "dd08_dedup_clusters" ->
        "star edges: flood clusters as ONE component, O(n) edges",
      "dd13_lsh_r2" ->
        "r=2 keys + cap: template still floods a bucket, still skipped",
      "tx12_winnow_overlap" ->
        "fp bucket cap: 300 identical docs share every fp, all skipped — flood adds ZERO pairs",
      "dd15_incremental_neardup" ->
        "anti-join: every flood copy matches the template's corpus band key — all rejected, admitted set unchanged",
      "dd18_dup_spans" ->
        "frequency rollup, NO pair stage: 300 template copies add ~300 whole-doc span rows at linear window-hash cost — no cap needed",
      "dd21_containment" ->
        "containment rides the same capped banding: flooded buckets skipped, verdicts stay organic",
      "dd20_soft_weights" ->
        "star edges cluster the flood as ONE group: +300 rows of weight 1e6/(n+300)-ish, no pair blowup")
    floodAudited.foreach { case (name, claim) =>
      val q = byName(name)
      val plainRows = q.fn(spark, sfDir).count()
      spark.sharedState.cacheManager.clearCache()
      // rows untimed via count; metrics from a full noop materialization
      // (count() prunes work — the Bench r16 methodology)
      val rows = q.fn(spark, floodDir).count()
      spark.sharedState.cacheManager.clearCache()
      val l = new StageMetricsListener
      l.collect(spark) {
        q.fn(spark, floodDir).write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
      sb ++= s"| $name | $plainRows | $rows | ${fmt(l.shuffleWriteBytes)} " +
        s"| ${fmt(l.spillBytes)} | $claim |\n"
    }

    // Cluster-once / audit-many: materialize the (doc_id, cluster_id)
    // labels ONCE, then measure the dd26 audit ALONE against the saved
    // table — the evidence that repeat audits scan the ~16 B/doc label
    // table, not the corpus.
    val labelDir = graft.operators.Scratch.dir("graft-audit-labels")
    val corpusDocs = graft.Tables.documents(spark, sfDir)
    graft.operators.DedupOps.clusterLabels(corpusDocs)
      .write.mode("overwrite").parquet(labelDir)
    spark.sharedState.cacheManager.clearCache()
    val auditDf = graft.operators.DedupOps.labelAudit(spark.read.parquet(labelDir))
    val auditL = new StageMetricsListener
    auditL.collect(spark) {
      auditDf.write.format("noop").mode("overwrite").save()
    }
    val auditScan = scannedBytes(auditDf.queryExecution.executedPlan)
    val corpusScan = scannedBytes(
      corpusDocs.queryExecution.executedPlan)
    sb ++= "\n## Cluster-once / audit-many (dd26 audit measured alone)\n\n"
    sb ++= "Labels materialized once to parquet, then the dd26 census audit\n"
    sb ++= "run against the SAVED table. Its scan is the label table, not the\n"
    sb ++= "corpus — the shape every repeat audit takes at 100 TB.\n\n"
    sb ++= "| measurement | bytes |\n|---|---|\n"
    sb ++= s"| documents corpus (what the inline recompute scans) | ${fmt(corpusScan)} |\n"
    sb ++= s"| audit scan (saved label table) | ${fmt(auditScan)} |\n"
    sb ++= s"| audit shuffle write | ${fmt(auditL.shuffleWriteBytes)} |\n"
    sb ++= s"| audit spill | ${fmt(auditL.spillBytes)} |\n"

    // preserve ScaleSmoke's `## Derived …` sections: the two tools share
    // SCALE.md, and a full-table regeneration must not silently wipe the
    // smoke evidence (previously an ordering hazard — ShuffleAudit had
    // to run first or the smoke sections vanished)
    val outPath = java.nio.file.Paths.get(out)
    val existing =
      if (!java.nio.file.Files.exists(outPath)) ""
      else java.nio.file.Files.readString(outPath)
    java.nio.file.Files.writeString(outPath,
      sb.toString + preservedDerived(existing))
    println(s"wrote $out (${audited.size + floodAudited.size} queries + cluster-once section)")
    spark.stop()
  }

  /** Pure preservation rule (spec-pinned beside ScaleSmoke.spliceSection):
    * everything from the first `## Derived` section onward survives a
    * full audit-table regeneration verbatim.
    */
  private[tools] def preservedDerived(existing: String): String =
    existing.split("(?=\n## Derived )")
      .filter(_.startsWith("\n## Derived ")).mkString
}
