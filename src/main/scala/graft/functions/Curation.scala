package graft.functions

import graft.{Portable => P}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation driver API — the cu01 plan as a function (the gated
  * query calls THIS, so API and oracle can't diverge). See
  * `graft.operators.CurationOps` for the full semantics and scale notes.
  */
object Curation {

  /** Per-document curation ledger: predicted language, quality verdict,
    * exact-dup keeper flag, near-dup cluster + keeper flag, content-hash
    * split, and the final `kept` verdict — one row per input document,
    * one scan, every signal reusing its gated query's machinery.
    * `WHERE kept` is the training corpus; dropped rows carry the reason.
    */
  def ledger(docs0: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    // spread: every per-row signal below (language scores, quality
    // filters, md5 digest) is computed BELOW the first exchange, so on
    // the one-split fixture scan it would run single-task (r18); a
    // no-op at production scan widths
    val docs = graft.Tables.spread(docs0).select(
      col(idCol).as("doc_id"), col(textCol).as("text"),
      col(sourceCol).as("source"))
    val labels = graft.operators.DedupOps.clusterLabels(docs)
    // every signal expression is the SHARED snippet its standalone
    // gated query runs (sparkLangScores/Case = tx01, isQuality = tx05,
    // sparkSplitCase = sm02) — the ledger assembles, never re-derives
    val base = docs
      .selectExpr("doc_id", "text", "source",
        "split(lower(text), '\\\\s+') as ltoks")
      .selectExpr("doc_id" +: "text" +: "source" +: TextOps.sparkLangScores: _*)
      .withColumn("pred_lang", expr(TextOps.sparkLangCase))
      .withColumn("is_quality", TextQuality.isQuality("text"))
      .selectExpr(
        "doc_id", "pred_lang", "is_quality",
        s"${P.hash60("text")} as digest",
        s"${graft.operators.SamplingOps.sparkSplitCase} as split")
      .selectExpr("*",
        "doc_id = min(doc_id) over (partition by digest) as exact_keep")
    base.join(labels, "doc_id")
      .selectExpr(
        "doc_id", "pred_lang", "is_quality", "exact_keep", "cluster_id",
        "cluster_id = doc_id as near_keep", "split",
        "is_quality and exact_keep and cluster_id = doc_id as kept")
      .withColumnRenamed("doc_id", idCol)
  }

  /** The FULL curation ledger — `ledger` extended with every round-6
    * signal: gopher rule verdict (tx13), adaptive per-source median
    * quality (cu02), deterministic mixture-rebalance membership (sm04),
    * and the language-label agreement flag (tx14). One plan, one
    * documents scan for all per-row signals (language scores, quality,
    * gopher signals, digest, split, score come out of a single codegen
    * projection); the exchanges are the digest window, the source
    * window, the tiny per-source count agg (broadcast back), and the
    * CC label rounds — text never shuffles. `kept` is the conjunction
    * of every drop-worthy signal; `lang_ok` stays informational (the
    * tx01 heuristic only knows en/de/fr, so gating on it would drop
    * every honestly-labeled zh/es document).
    */
  def fullLedger(docs0: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source",
      langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // spread: same rationale as `ledger` — the single codegen projection
    // carrying every per-row signal sits below the first exchange
    val docs = graft.Tables.spread(docs0).select(
      col(idCol).as("doc_id"), col(textCol).as("text"),
      col(sourceCol).as("source"), col(langCol).as("lang"))
    val labels = graft.operators.DedupOps.clusterLabels(docs)
    val keep = Seq("doc_id", "source", "lang")
    // ONE scan projection for every per-row signal, each expression the
    // SHARED snippet its standalone gated query runs
    val base = docs
      .selectExpr("doc_id", "source", "lang",
        "text as _text", "split(lower(text), '\\\\s+') as _toks")
      .selectExpr(keep ++ Seq("_text", "_toks") ++
        TextOps.sparkLangScores.map(_.replace("ltoks", "_toks")) ++
        TextQuality.gopherSignalExprs ++ Seq(
          s"${P.hash60("_text")} as digest",
          s"${graft.operators.SamplingOps.sparkSplitCase} as split",
          "cast(floor(cast(100 as double) * length(_text) / size(_toks)) as bigint) as score"): _*)
      .withColumn("pred_lang", expr(TextOps.sparkLangCase))
      .withColumn("is_quality", TextQuality.isQuality("_text"))
      .selectExpr(keep ++ Seq("pred_lang", "is_quality", "digest", "split",
        "score", s"${TextQuality.gopherConjExpr} as gopher_pass"): _*)
    val bysrc = Window.partitionBy("source")
    val flagged = Sampling.mixtureFlag(base, "doc_id", "source", shrink = 2)
      .withColumn("exact_keep",
        expr("doc_id = min(doc_id) over (partition by digest)"))
      .withColumn("rn",
        row_number().over(bysrc.orderBy(col("score"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(bysrc))
      .withColumn("med",
        max(when(expr("rn = (n + 1) div 2"), col("score"))).over(bysrc))
    flagged.join(labels, "doc_id")
      .selectExpr(
        "doc_id", "pred_lang", "pred_lang = lang as lang_ok", "is_quality",
        "gopher_pass", "exact_keep", "cluster_id = doc_id as near_keep",
        "score > med as above_med", "kp is not null as mix_keep", "split",
        "is_quality and gopher_pass and exact_keep and cluster_id = doc_id " +
          "and score > med and kp is not null as kept")
      .withColumnRenamed("doc_id", idCol)
  }

  /** LEAKAGE-SAFE train/valid/test split: assign each near-dup CLUSTER
    * — not each document — to a split by hashing its cluster label, so
    * two near-duplicate documents can never land on opposite sides of a
    * train/eval boundary (the contamination path a per-document hash
    * split like sm02 leaves open). Buckets hash60('csplit|' ||
    * cluster_id) mod 10: 0-7 train, 8 valid, 9 test. Returns
    * (idCol, cluster_id, split). Rides dd08's exact clustering
    * machinery; the split itself is a scan-local projection of the
    * label — no exchange beyond the CC rounds' (id, label) longs.
    */
  def leakageSafeSplit(docs0: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    graft.operators.DedupOps.clusterLabels(docs0, idCol, textCol)
      .selectExpr(idCol, "cluster_id",
        s"""case when ${P.hash60("concat('csplit|', cast(cluster_id as string))")} % 10 < 8 then 'train'
           |     when ${P.hash60("concat('csplit|', cast(cluster_id as string))")} % 10 = 8 then 'valid'
           |     else 'test' end as split""".stripMargin)

  /** Quality-aware near-dup cluster keeper: per dd08 cluster, flag the
    * member with the highest tx02 quality score (doc_id tiebreak) as
    * the keeper, instead of cu01's min-id representative — "keep the
    * best copy", the selection a production curation pass wants. One
    * row per document: (idCol, cluster_id, score, keep). Reuses the
    * exact clustering machinery the dd08 oracle pins; the only added
    * exchange is the per-cluster ranking window over
    * (doc_id, cluster_id, score) longs.
    */
  def qualityKeeper(docs0: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.spread(docs0)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val labels = graft.operators.DedupOps.clusterLabels(docs)
    // tx02's mean-token-length×100 score — the shared integer-exact
    // snippet cu02/cu03 also inline
    val scored = docs.selectExpr("doc_id",
      "cast(floor(cast(100 as double) * length(text) / " +
        "size(split(lower(text), '\\\\s+'))) as bigint) as score")
    scored.join(labels, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster_id")
          .orderBy(col("score").desc, col("doc_id"))))
      .selectExpr("doc_id", "cluster_id", "score", "rn = 1 as keep")
      .withColumnRenamed("doc_id", idCol)
  }

  /** URL domain blocklist filtering: adds `host` (the URL's authority),
    * `reg_domain` (last two dot-labels of the host — the registered
    * domain, so subdomains of a blocked domain are blocked too), and
    * `blocked`. Rows whose URL doesn't parse get empty host/reg_domain
    * and are never blocked — surface them with `host = ''` rather than
    * dropping silently. The blocklist inlines as a literal IN (codegen,
    * zero shuffle); lists too large to inline should join a broadcast
    * blocklist table on `reg_domain` instead. The gated cu05 query IS
    * this function over synthesized URLs.
    */
  def domainFilter(docs: DataFrame, urlCol: String = "url",
      blocklist: Seq[String] = Nil): DataFrame = {
    require(blocklist.forall(d => !d.contains("'")),
      "blocklist entries must not contain quotes")
    val blockedExpr =
      if (blocklist.isEmpty) "false"
      else s"reg_domain in (${blocklist.map(d => s"'$d'").mkString(", ")})"
    docs
      .withColumn("host",
        regexp_extract(col(urlCol), "^[a-z]+://([^/]+)", 1))
      .withColumn("reg_domain",
        regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
      .withColumn("blocked", expr(blockedExpr))
  }

  /** ADAPTIVE quality filtering: keep each document scoring STRICTLY
    * above its own source's median quality score — per-group thresholds
    * instead of one global band, so a low-quality source doesn't set
    * the bar for a high-quality one (and vice versa). The score is
    * tx02's mean-token-length×100 (integer-exact); the median is the
    * deterministic LOWER median (score at row (n+1) div 2 under
    * (score, id) order), computed as a second window over the SAME
    * source partitioning — one exchange of (id, source, score) rows,
    * text never shuffles, no self-join.
    */
  def adaptiveQualityKeep(docs0: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bysrc = Window.partitionBy("source")
    graft.Tables.spread(docs0).selectExpr(
        s"$idCol as doc_id", s"$sourceCol as source",
        s"cast(floor(cast(100 as double) * length($textCol) / " +
          s"size(split(lower($textCol), '\\\\s+'))) as bigint) as score")
      .withColumn("rn",
        row_number().over(bysrc.orderBy(col("score"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(bysrc))
      .withColumn("med",
        max(when(expr("rn = (n + 1) div 2"), col("score"))).over(bysrc))
      .filter(col("score") > col("med"))
      .select(col("doc_id").as(idCol), col("source").as(sourceCol),
        col("score"), col("med"))
  }

  /** Dedup-aware mixture rebalance (the cu07 plan as a function — the
    * gated query calls THIS): per group, raw/kept doc and char counts
    * under exact dedup (dd01's digest-window keeper), the sqrt
    * temperature weight `w_ppm` over KEPT chars (delegating to
    * [[Sampling.temperatureWeights]] on the per-group aggregate, where
    * its groupBy-sum re-agg is a no-op), and `shift_ppm` = w_ppm minus
    * the group's natural share of kept chars. One scan; the digest
    * window shuffles 60-bit longs (text never moves); everything after
    * the per-group rollup runs on one row per group via broadcast.
    */
  def mixtureRebalance(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val keyed = docs.selectExpr(s"$groupCol as source",
      s"cast(length($textCol) as bigint) as n_chars",
      s"$idCol = min($idCol) over (partition by ${P.hash60(textCol)}) as keep")
    val agg = keyed.groupBy("source").agg(
      count(lit(1)).cast("long").as("raw_docs"),
      sum("n_chars").cast("long").as("raw_chars"),
      sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("kept_docs"),
      sum(when(col("keep"), col("n_chars")).otherwise(0L)).cast("long")
        .as("kept_chars"))
    val weighted = Sampling.temperatureWeights(agg, "source", "kept_chars")
      .select("source", "w_ppm")
    val totKept = agg.agg(sum("kept_chars").cast("long").as("tc"))
    agg.join(weighted, "source")
      .crossJoin(broadcast(totKept))
      .selectExpr("source", "raw_docs", "raw_chars", "kept_docs",
        "kept_chars", "w_ppm",
        "w_ppm - (1000000 * kept_chars) div tc as shift_ppm")
      .withColumnRenamed("source", groupCol)
  }

  /** Largest-remainder token-budget apportionment (epoch planning):
    * (groupCol, n_docs, tokens, alloc_tokens, alloc_ppm) where
    * alloc_tokens = floor(budget · tokens / total) plus one leftover
    * unit to the largest fractional remainders (ties to the smaller
    * group), so Σ alloc_tokens = budget EXACTLY — integer arithmetic
    * throughout (remainders compare as (budget·tokens) mod total).
    * Shared by the gated cu10 query; the rollup is map-side combined,
    * the apportionment windows run on the group-cardinality frame.
    */
  def tokenBudget(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", budget: Long = 100000L): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    docs
      .selectExpr(s"$groupCol as source", s"size(split($textCol, '\\\\s+')) as ntok")
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("ntok").cast("long").as("tokens"))
      .selectExpr("source", "n_docs", "tokens",
        "sum(tokens) over () as total")
      .selectExpr("source", "n_docs", "tokens",
        s"($budget * tokens) div total as base",
        s"($budget * tokens) % total as frac")
      .selectExpr("source", "n_docs", "tokens", "base",
        "row_number() over (order by frac desc, source) as rk",
        s"$budget - sum(base) over () as rem")
      .selectExpr("source", "n_docs", "tokens",
        "cast(base + case when rk <= rem then 1 else 0 end as bigint) as alloc_tokens",
        s"cast((1000000 * (base + case when rk <= rem then 1 else 0 end)) div $budget as bigint) as alloc_ppm")
      .withColumnRenamed("source", groupCol)
  }

  /** Per-document equal-mass shard ASSIGNMENT —
    * `(doc_id, n_chars, total, shard_id)` for every document, shard_id
    * in `[0, shards)`: cut the corpus into `shards` contiguous mass
    * tiers by (n_chars, doc_id) order — shard k holds the documents
    * whose EXCLUSIVE running mass lands in
    * [k·total/shards, (k+1)·total/shards). This is the row-level table
    * [[equalMassShards]] rolls up and
    * [[graft.sources.TfRecords.writeSharded]] exports — kept separate
    * so the physical writer consumes the same cut the gated rollup
    * proves the mass bound on.
    *
    * Scale: the running mass rides
    * [[graft.operators.Ordinal.withGlobalPrefixSum]] — the frame is
    * EVERY document, so a `SUM() OVER (ORDER BY ...)` global window
    * here would funnel the whole corpus through one partition (the r12
    * window-funnel class). The total enters as a broadcast scalar.
    */
  def equalMassAssign(docs: DataFrame, shards: Int = 8): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // frame read twice (quantile sketch + prefix); caller clearCache
    // releases
    val o = docs.selectExpr("doc_id", "cast(n_chars as long) as n_chars")
      .persist()
    val t = o.agg(sum("n_chars").cast("long").as("total"))
    graft.operators.Ordinal
      .withGlobalPrefixSum(o, "n_chars", "n_chars", "cum",
        tieCols = Seq("doc_id"))
      .crossJoin(broadcast(t))
      // least-clamp: a zero-mass document sorting last has cum == total
      // (exclusive prefix), which would index one past the final shard
      .selectExpr("doc_id", "n_chars", "total",
        s"least(($shards * cum) div total, ${shards - 1}) as shard_id")
  }

  /** The `shards`-row equal-mass ROLLUP of [[equalMassAssign]] —
    * `(shard_id, n_docs, mass, mass_ppm)`. Writing training data by
    * this cut gives every output shard ≈ the same token budget
    * regardless of the document-length distribution (doc-COUNT sharding
    * leaves shards far apart in mass under long-tailed lengths, and
    * shard mass is what bounds a training job's per-file work). Each
    * shard's mass deviates from total/shards by less than one maximum
    * document — the boundary lands mid-document at most once per cut
    * (CurationSpec pins the bound). Shared by the gated cu15 query.
    */
  def equalMassShards(docs: DataFrame, shards: Int = 8): DataFrame =
    equalMassAssign(docs, shards)
      .groupBy("shard_id")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum("n_chars").cast("long").as("mass"),
        max("total").as("_total"))
      // ppm in DECIMAL(38,0): 10^6 * mass overflows BIGINT once a
      // shard holds > ~9.2e12 chars (a few TB of text) — the an18
      // wide-decimal convention; DuckDB runs the same math in HUGEINT
      .selectExpr("cast(shard_id as bigint) as shard_id", "n_docs", "mass",
        "cast((cast(1000000 as decimal(38,0)) * mass) div _total as bigint) as mass_ppm")

  /** Curriculum ordering: split each source into `phases` contiguous
    * complexity tiers (ntile over the cu02 complexity score — mean
    * token length ×100 — ascending, doc_id tiebreak) and give every
    * document a deterministic within-phase position by salted content
    * hash (the reproducible stand-in for an in-phase shuffle). Training
    * walks phase 1 → N, `ord` within each — rerun-identical on any
    * cluster. Shared by the gated cu11 query. Scale: one source-keyed
    * exchange carries both windows ((source) then (source, phase) — the
    * second partitioning refines the first); text never shuffles, only
    * (id, score, ntok) longs.
    */
  def curriculum(docs0: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source",
      phases: Int = 4): DataFrame = {
    require(phases >= 1, s"phases must be >= 1, got $phases")
    import org.apache.spark.sql.expressions.Window
    docs0.selectExpr(
        s"$idCol as doc_id", s"$sourceCol as source",
        s"cast(floor(cast(100 as double) * length($textCol) / " +
          s"size(split(lower($textCol), '\\\\s+'))) as bigint) as score",
        s"cast(size(split($textCol, '\\\\s+')) as bigint) as ntok")
      .withColumn("phase", ntile(phases)
        .over(Window.partitionBy("source")
          .orderBy(col("score"), col("doc_id"))).cast("long"))
      .withColumn("ord", row_number()
        .over(Window.partitionBy("source", "phase")
          .orderBy(expr(graft.Portable.hash60(
            "concat('cur|', cast(doc_id as string))")), col("doc_id")))
        .cast("long"))
      .select(col("doc_id").as(idCol), col("source").as(sourceCol),
        col("score"), col("ntok"), col("phase"), col("ord"))
  }

  /** The DATASET CARD: the one-page corpus summary every data release
    * ships — size (docs/tokens/chars), language share, quality rate,
    * exact-duplicate rate, PII incidence, and code share, as
    * (metric, value) rows. Every signal is the SHARED expression its
    * standalone gated query pins (tx01 language case, tx05 quality,
    * dd01 digest, tx17 PII patterns, tx21 code threshold) — the card
    * assembles, never re-derives, so it can't drift from the per-signal
    * oracles. Shared by the gated cu13 query. Scale: ONE codegen'd scan
    * projection computes every per-doc signal; the single global
    * aggregate (count-distinct digest included) partial-aggregates
    * map-side — the whole card costs one pass at any corpus size.
    */
  /** The per-doc signal projection behind both card shapes — one
    * codegen'd scan computing every cu13 signal, with `keep` columns
    * (bare names already present on `docs0`) carried through for
    * grouping.
    */
  private def cardSignals(docs0: DataFrame, textCol: String,
      keep: Seq[String]): DataFrame =
    docs0.selectExpr(keep ++ Seq(s"$textCol as _text",
        s"split(lower($textCol), '\\\\s+') as ltoks"): _*)
      .selectExpr(keep ++ Seq("_text", "ltoks") ++ TextOps.sparkLangScores: _*)
      .withColumn("pred_lang", expr(TextOps.sparkLangCase))
      .withColumn("is_quality", TextQuality.isQuality("_text"))
      .withColumn("n_pii", TextQuality.piiPatterns
        .map { case (_, p, _) => regexp_count(col("_text"), lit(p)) }
        .reduce(_ + _))
      .selectExpr(keep ++ Seq(
        "cast(size(ltoks) as bigint) as ntok",
        "cast(length(_text) as bigint) as nchr",
        "pred_lang", "is_quality", "n_pii > 0 as has_pii",
        s"${graft.Portable.hash60("_text")} as digest",
        "(1000000 * (length(_text) - length(translate(_text, '{}();=', '')))) " +
          "div length(_text) > 15000 as is_code"): _*)

  private def cardAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).cast("long").as("n"),
    sum("ntok").cast("long").as("ntok"),
    sum("nchr").cast("long").as("nchr"),
    count(when(col("pred_lang") === "en", 1)).cast("long").as("nen"),
    count(when(col("is_quality"), 1)).cast("long").as("nq"),
    countDistinct(col("digest")).cast("long").as("nd"),
    count(when(col("has_pii"), 1)).cast("long").as("npii"),
    count(when(col("is_code"), 1)).cast("long").as("ncode"))

  def datasetCard(docs0: DataFrame, textCol: String = "text"): DataFrame =
    cardSignals(docs0, textCol, Nil)
      .agg(cardAggs.head, cardAggs.tail: _*)
      .selectExpr("stack(8, " +
        "'n_docs', n, " +
        "'n_tokens', ntok, " +
        "'n_chars', nchr, " +
        "'lang_en_ppm', (1000000 * nen) div n, " +
        "'quality_ppm', (1000000 * nq) div n, " +
        "'exact_dup_ppm', (1000000 * (n - nd)) div n, " +
        "'pii_ppm', (1000000 * npii) div n, " +
        "'code_ppm', (1000000 * ncode) div n) as (metric, value)")

  /** Per-source dataset cards — `datasetCard`'s signals keyed by
    * `groupCol`, one WIDE row per group (the per-subcorpus view a
    * mixture decision reads side-by-side). Exact-dup rate is scoped to
    * the group: a doc duplicated across two sources counts as a keeper
    * in each (cross-source duplication is dd12/ss12's contamination
    * story, not this card's). Shared by the gated cu14 query. Scale:
    * same one-scan projection; the grouped aggregate (count-distinct
    * digest included) partial-aggregates map-side to group rows.
    */
  def sourceCards(docs0: DataFrame, textCol: String = "text",
      groupCol: String = "source"): DataFrame =
    cardSignals(
      docs0.selectExpr(s"$groupCol as _g", s"$textCol as _cardtext"),
      "_cardtext", Seq("_g"))
      .groupBy("_g")
      .agg(cardAggs.head, cardAggs.tail: _*)
      .selectExpr(s"_g as $groupCol", "n as n_docs", "ntok as n_tokens",
        "nchr as n_chars",
        "(1000000 * nen) div n as lang_en_ppm",
        "(1000000 * nq) div n as quality_ppm",
        "(1000000 * (n - nd)) div n as exact_dup_ppm",
        "(1000000 * npii) div n as pii_ppm",
        "(1000000 * ncode) div n as code_ppm")

  /** Stage-by-stage curation funnel over `ledger`: rows entering,
    * surviving, and dropped by each stage (quality → exact dedup →
    * near-dup keeper). Every count is a conditional over the SAME
    * ledger pass, so conservation (rows_in = rows_out + dropped,
    * stage N rows_out = stage N+1 rows_in) holds by construction —
    * never by reconciling independent recounts. Shared by the gated
    * cu12 query. Scale: the ledger's plan plus one map-side-combined
    * conditional aggregate to a single row, unpivoted to 3.
    */
  def funnel(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source"): DataFrame =
    ledger(docs, idCol, textCol, sourceCol)
      .agg(
        count(lit(1)).cast("long").as("n0"),
        count(when(col("is_quality"), 1)).cast("long").as("n1"),
        count(when(col("is_quality") && col("exact_keep"), 1)).cast("long").as("n2"),
        count(when(col("kept"), 1)).cast("long").as("n3"))
      .selectExpr(
        "stack(3, " +
          "cast(1 as bigint), 'quality', n0, n1, " +
          "cast(2 as bigint), 'exact_dedup', n1, n2, " +
          "cast(3 as bigint), 'near_dup', n2, n3) " +
          "as (stage_ord, stage, rows_in, rows_out)")
      .selectExpr("stage_ord", "stage", "rows_in", "rows_out",
        "rows_in - rows_out as dropped")
}
