package graft.functions

import graft.{Portable => P}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling driver APIs — function-shaped entry points over the plans
  * the sm* queries pin (users call these; the queries carry the
  * oracles, and the gated sm04 rollup aggregates THIS machinery so API
  * and oracle can't diverge).
  */
object Sampling {

  /** Per-row keep flag for domain-mixture rebalancing toward a uniform
    * target at corpus/`shrink` size (sm04's machinery): per-source keep
    * probability min(1, quota/n_s) with quota = total div (shrink·nsrc),
    * realized deterministically as a hash-ppm threshold on the id — so
    * membership is stable across runs and retries. The input frame
    * keeps all its columns plus `kp` (1 or null).
    *
    * Scale: the fact table never shuffles — per-source counts are a
    * map-side-combined aggregation (nsrc rows), the ppm table
    * broadcasts back, the flag is a scan-local projection.
    */
  private[graft] def mixtureFlag(docs: DataFrame, idCol: String,
      sourceCol: String, shrink: Int): DataFrame = {
    require(shrink >= 1, s"shrink must be >= 1, got $shrink")
    val n = docs.groupBy(sourceCol).agg(count(lit(1)).as("n_src"))
    val t = n.agg(sum("n_src").cast("bigint").as("total"),
      count(lit(1)).as("nsrc"))
    val p = n.crossJoin(broadcast(t))
      .selectExpr(sourceCol, "n_src",
        s"least(1000000, (1000000 * (total div ($shrink * nsrc))) div n_src) as keep_ppm")
      .drop("n_src")
    docs.join(broadcast(p), sourceCol)
      .withColumn("kp",
        when(expr(s"${P.hash60(s"concat('mix|', cast($idCol as string))")} % 1000000")
          < col("keep_ppm"), 1))
      .drop("keep_ppm")
  }

  /** Deterministically downsample toward a uniform source mixture at
    * corpus/`shrink` size. Returns the kept rows with their original
    * columns.
    */
  def mixtureSample(docs: DataFrame, idCol: String = "doc_id",
      sourceCol: String = "source", shrink: Int = 2): DataFrame =
    mixtureFlag(docs, idCol, sourceCol, shrink)
      .filter(col("kp") === 1).drop("kp")

  /** Group-aware train/valid/test assignment (sm02's 80/10/10 split by
    * source hash — every document of a source lands in the same split,
    * the leakage guard for near-duplicates within a crawl domain).
    */
  def assignSplit(docs: DataFrame, sourceCol: String = "source"): DataFrame =
    docs.withColumn("split",
      expr(graft.operators.SamplingOps.splitCaseFor(sourceCol)))

  /** CCNet-style perplexity-bucketed sampling (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data", adapted to the integer-exact gate): per source, rank
    * documents by their bigram-LM fluency (tx16's machinery; per-bigram
    * mean as the perplexity proxy — higher is more fluent), split into
    * head/middle/tail terciles, keep the head entirely, keep the middle
    * at `midPpm`/1e6 via the deterministic document hash, drop the
    * tail. Docs with < 2 tokens score 0 and land in the tail. Returns
    * (idCol, sourceCol, score, bucket, keep) for every input document.
    *
    * Scale: the LM counts are map-side-combined token aggs (text never
    * shuffles); the tercile split is one (id, source, score) window
    * exchange; the keep decision is pure hash arithmetic — a
    * 1000-executor rerun with different partitioning keeps EXACTLY the
    * same rows. The gated sm06 query IS this function.
    */
  def fluencyBuckets(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source",
      midPpm: Int = 500000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(midPpm >= 0 && midPpm <= 1000000,
      s"midPpm must be in [0, 1000000], got $midPpm")
    val base = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("text"), col(sourceCol).as("source"))
    val fl = graft.functions.TextOps.bigramFluency(base)
    val bysrc = Window.partitionBy("source")
    base.select("doc_id", "source")
      .join(fl, Seq("doc_id"), "left")
      .selectExpr("doc_id", "source",
        "coalesce(fluency_x1e6 div n_bigrams, 0L) as score")
      .withColumn("rn", row_number().over(
        bysrc.orderBy(col("score").desc, col("doc_id"))))
      .withColumn("n", count(lit(1)).over(bysrc))
      .selectExpr("doc_id", "source", "cast(score as bigint) as score",
        "case when rn * 3 <= n then 'head' " +
          "when rn * 3 <= 2 * n then 'middle' else 'tail' end as bucket")
      .selectExpr("doc_id", "source", "score", "bucket",
        "case bucket when 'head' then true when 'middle' then " +
          s"${P.hash60("concat('ppx|', cast(doc_id as string))")} % 1000000 < $midPpm " +
          "else false end as keep")
      .withColumnRenamed("doc_id", idCol)
      .withColumnRenamed("source", sourceCol)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", adapted to the
    * integer-exact gate): score every document by how much its hashed
    * unigram distribution looks like the TARGET subset's. Each token
    * hashes into one of `buckets` feature buckets; a token occurrence
    * in bucket h contributes floor(1e6·(tgt_h+1)/(all_h+1)) (add-one
    * smoothed target share, scaled to parts-per-million — log-free and
    * all-integer so engines agree bit-for-bit). Returns per document:
    * n_toks, the summed weight `w_x1e6`, and the per-token mean
    * `wavg_x1e6` — rank by wavg and keep the top mass to resample the
    * corpus toward the target domain.
    *
    * Scale: tokens never shuffle — both bucket-count aggregations
    * combine map-side down to ≤ `buckets` rows, those tiny tables
    * BROADCAST back onto the token stream, and the per-doc sum
    * partial-aggregates to one row per document before its exchange.
    * The gated sm05 query aggregates THIS machinery (target =
    * source 'src0'), so API and oracle can't diverge.
    */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // Deliberately NOT persisted: three consumers re-run the scan +
    // explode, but that's a map-only codegen'd pass — caching the token
    // stream would pin ~corpus-sized state for work cheaper than the
    // cache write. (tx16 persists its bigram stream because its reuse
    // crosses a shuffle; this one never shuffles.)
    val tok = graft.Tables.spread(docs)
      .withColumn("_tgt", isTarget)
      .selectExpr(idCol, "_tgt",
        s"explode(split(lower($textCol), '\\\\s+')) as w")
      .selectExpr(idCol, "_tgt",
        s"${P.hash60("concat('dsir|', w)")} % $buckets as h")
    val allc = tok.groupBy("h").agg(count(lit(1)).as("n_all"))
    val tgtc = tok.filter(col("_tgt")).groupBy("h").agg(count(lit(1)).as("n_tgt"))
    tok.join(broadcast(allc), "h").join(broadcast(tgtc), Seq("h"), "left")
      .selectExpr(idCol, "coalesce(n_tgt, 0L) as n_tgt", "n_all")
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_toks"),
        sum(expr("(1000000 * (n_tgt + 1)) div (n_all + 1)"))
          .cast("long").as("w_x1e6"))
      .selectExpr(idCol, "n_toks", "w_x1e6",
        "w_x1e6 div n_toks as wavg_x1e6")
  }

  /** Temperature-scaled multinomial mixture over corpus groups (the
    * multilingual-pretraining rebalance of Conneau & Lample 2019 /
    * mT5: sample group i with p_i ∝ m_i^α, α = 0.5, where m_i is the
    * group's character mass — upweights low-resource languages without
    * flattening the mixture entirely). α is FIXED at 1/2 so the power
    * is `sqrt`, which IEEE-754 requires correctly rounded — the one
    * exponent both engines compute bit-identically; other temperatures
    * need `pow`, whose libm rounding is not portable across engines.
    *
    * All downstream arithmetic is integer, staged so no product leaves
    * bigint range even at exabyte group masses: weights are
    * floor(1000·sqrt(m_i)) bigints, normalized to parts-per-million of
    * their exact sum, and the budget is allocated against the ppm
    * share. (Bounds: 1e6·wgt < 2^63 for m_i < ~8·10^18 chars;
    * budget·w_ppm < 2^63 for budget < ~9·10^12 — both far past a
    * 100 TB corpus and a 10T-char draw.) Returns per group: `mass`
    * (char count), `w_ppm` (temperature share in ppm), `p_bp` (same in
    * basis points), `draws` (characters allocated from `budget`), and
    * `epochs_ppm` (draws·1e6/mass — how many times that group's corpus
    * is repeated; > 1e6 means upsampling).
    *
    * Scale: one map-side-combined aggregation to ngroups rows; the
    * total is a second aggregation over that tiny frame, broadcast
    * back. The corpus itself never shuffles.
    */
  /** Size-proportional Poisson (PPS) sampling with Horvitz–Thompson
    * accounting: row i is kept with probability p_i = min(1, size_i/cap),
    * realized deterministically as a hash-ppm threshold on the id (the
    * sm01/sm04 reproducibility contract — membership is a pure function
    * of the row). Each kept row carries `p_ppm` and its HT mass
    * contribution `ht_mass` = size_i·10⁶/p_ppm, so Σ ht_mass over the
    * KEPT rows is an unbiased estimate of Σ size_i over ALL rows — the
    * token-accounting identity a downsampled corpus needs to still
    * report its true token budget.
    *
    * Everything is exact bigint arithmetic: 10⁶ is divisible by `cap`
    * (required), so p_ppm = size·(10⁶/cap) exactly, and ht_mass
    * collapses to `cap` for size < cap and `size` otherwise — zero
    * rounding anywhere. (Overflow: size·(10⁶/cap) < 2⁶³ for any
    * realistic document size.)
    *
    * Scale: the keep decision and both carried columns are scan-local
    * projections — ZERO shuffle; only the caller's rollup exchanges.
    */
  def poissonSample(docs: DataFrame, idCol: String = "doc_id",
      sizeCol: String = "n_chars", cap: Int = 500): DataFrame = {
    require(cap >= 1 && 1000000 % cap == 0,
      s"cap must divide 1e6 for exact ppm arithmetic, got $cap")
    val scale = 1000000 / cap
    docs
      .withColumn("p_ppm",
        expr(s"least(1000000L, cast($sizeCol as bigint) * $scale)"))
      .filter(
        expr(s"${P.hash60(s"concat('pps|', cast($idCol as string))")} % 1000000")
          < col("p_ppm"))
      .withColumn("ht_mass",
        expr(s"(cast($sizeCol as bigint) * 1000000) div p_ppm"))
  }

  /** The universe-membership predicate (SQL text): key ∈ sampled
    * universe iff hash60('univ|' || key) mod 100 < pct. Shared by
    * `universeSample` and the gated sm09 accounting so the API and the
    * oracle-checked query can't diverge.
    */
  private[graft] def universeFlagExpr(keyCol: String, pct: Int = 10): String = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1,100], got $pct")
    s"${P.hash60(s"concat('univ|', cast($keyCol as string))")} % 100 < $pct"
  }

  /** UNIVERSE (join-consistent) sampling: keep rows whose JOIN KEY falls
    * in a pct% hash-sampled key universe. Applying the same call (same
    * key domain, same pct) to every table sharing the key samples them
    * CONSISTENTLY — a sampled fact row's dimension/sibling rows are
    * always present, and the key-equi-join of two universe-sampled
    * tables is itself a pct% universe sample of the full join.
    * Independent per-table Bernoulli sampling destroys both properties:
    * the join of two 10% Bernoulli samples keeps ~1% of join rows and
    * orphans the rest. This is the BlinkDB/Quickr-style correlated
    * sampling an approximate 100 TB join pipeline needs; estimates
    * scale by 100/pct (Horvitz–Thompson on the key universe).
    * The keep decision is a scan-local hash of the key — zero shuffle,
    * no coordination between tables.
    */
  def universeSample(df: DataFrame, keyCol: String, pct: Int = 10): DataFrame =
    df.filter(expr(universeFlagExpr(keyCol, pct)))

  /** NEYMAN (optimal) stratified allocation: split a sampling budget
    * across strata proportionally to N_h·σ_h — high-variance strata get
    * more of the budget than proportional allocation gives them, which
    * minimizes the estimator's variance at fixed cost (the classical
    * survey-sampling result; the "where to spend the labeling/eval
    * budget" decision for a grouped corpus). σ is computed from EXACT
    * integer moments (n·Σx² − (Σx)², BIGINT — no decimal needed since
    * sizes are integers), so N_h·σ_h = √varnum costs exactly one
    * correctly-rounded sqrt; weights are decimal-quantized before the
    * cross-stratum sum so the total is order-insensitive. Returns
    * (groupCol, n_docs, sd_x100, alloc_neyman, alloc_prop, shift) —
    * shift > 0 means Neyman up-weights the stratum vs proportional.
    * Scale: one map-side-combined moment agg per stratum; everything
    * after runs on the |strata|-row aggregate via broadcast.
    */
  def neymanAllocation(docs: DataFrame, groupCol: String = "source",
      sizeCol: String = "n_chars", budget: Long = 1000L): DataFrame = {
    require(budget >= 1, s"budget must be positive, got $budget")
    val a = docs.groupBy(groupCol).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col(sizeCol)).cast("long").as("sx"),
      sum(col(sizeCol) * col(sizeCol)).cast("long").as("sxx"))
      .selectExpr(groupCol, "n", "n * sxx - sx * sx as var_num")
      .selectExpr(groupCol, "n",
        "cast(sqrt(cast(var_num as double)) as decimal(28,8)) as wq")
    val tot = a.agg(
      expr("cast(sum(wq) as double)").as("tw"),
      sum("n").cast("long").as("tn"))
    a.crossJoin(broadcast(tot))
      .selectExpr(groupCol, "n as n_docs",
        "cast(floor(100 * cast(wq as double) / n) as bigint) as sd_x100",
        s"cast(floor($budget * cast(wq as double) / tw) as bigint) as alloc_neyman",
        s"($budget * n) div tn as alloc_prop")
      .selectExpr(groupCol, "n_docs", "sd_x100", "alloc_neyman", "alloc_prop",
        "alloc_neyman - alloc_prop as shift")
  }

  /** Draw the [[neymanAllocation]] design without replacement: within
    * each stratum, keep the `alloc_neyman` lowest rows under a
    * deterministic id-hash order — rerun-stable (a pure function of the
    * ids), coordination-free, and exactly the allocated count unless
    * the stratum is smaller than its allocation. Returns the kept rows
    * with their original columns. The gated sm11 query rolls THIS up,
    * so design and execution share one allocation machinery. Scale: the
    * allocation is a broadcast |strata|-row table; ranking is one
    * window over (id, group, hash) longs per stratum.
    */
  def neymanSample(docs: DataFrame, groupCol: String = "source",
      sizeCol: String = "n_chars", idCol: String = "doc_id",
      budget: Long = 1000L): DataFrame = {
    val alloc = neymanAllocation(docs, groupCol, sizeCol, budget)
      .select(col(groupCol), col("alloc_neyman"))
    docs
      .withColumn("_rn", expr(
        s"row_number() over (partition by $groupCol order by " +
          s"${P.hash60(s"concat('ney|', cast($idCol as string))")}, $idCol)"))
      .join(broadcast(alloc), groupCol)
      .filter(col("_rn") <= col("alloc_neyman"))
      .drop("_rn", "alloc_neyman")
  }

  def temperatureWeights(docs: DataFrame, groupCol: String = "lang",
      massCol: String = "n_chars", budget: Long = 1000000L): DataFrame = {
    require(budget >= 1 && budget <= 9000000000000L,
      s"budget must be in [1, 9e12], got $budget")
    val m = docs.groupBy(groupCol)
      .agg(sum(massCol).cast("bigint").as("mass"))
      .selectExpr(groupCol, "mass",
        "cast(floor(1000 * sqrt(cast(mass as double))) as bigint) as wgt")
    val t = m.agg(sum("wgt").cast("bigint").as("tw"))
    m.crossJoin(broadcast(t))
      .selectExpr(groupCol, "mass", "(1000000 * wgt) div tw as w_ppm")
      .selectExpr(groupCol, "mass", "w_ppm",
        "w_ppm div 100 as p_bp",
        s"($budget * w_ppm) div 1000000 as draws",
        s"((($budget * w_ppm) div 1000000) * 1000000) div mass as epochs_ppm")
  }

  /** Deterministic Poisson-bootstrap confidence interval for the
    * per-group mean of `valueCol`: B=32 bootstrap replicas, each row's
    * replica multiplicity drawn from a Poisson(1) pmf approximated in
    * per-mille (0:368, 1:368, 2:184, 3:61, 4:19) by a salted content
    * hash — the online-bootstrap trick (Poisson counts ≈ multinomial
    * resampling without materializing N draws), made hash-deterministic
    * so reruns and engines agree bit-for-bit where true RNG bootstraps
    * can't be gated at all. Replica means are integer ×100; the CI is
    * the 2nd-smallest..2nd-largest replica mean (~94% coverage at
    * B=32). A replica that draws zero total weight (probability
    * .368^n — only microscopic groups) reports mean 0, the documented
    * degenerate. Shared by the gated sm12 query. Scale: the B-fold
    * expansion partial-aggregates map-side to (group × B) rows before
    * the one exchange; the rank windows order 32-row frames per group —
    * error bars on corpus stats for B× map work and no extra scan.
    */
  def bootstrapCI(docs: DataFrame, groupCol: String = "source",
      valueCol: String = "n_chars", idCol: String = "doc_id",
      b: Int = 32): DataFrame = {
    require(b >= 4 && b <= 256, s"replica count must be in [4, 256], got $b")
    val reps = docs
      .selectExpr(s"$groupCol as _g", s"$idCol as _id",
        s"cast($valueCol as bigint) as _x",
        s"explode(sequence(0, ${b - 1})) as _b")
      .selectExpr("_g", "_b", "_x",
        s"${P.hash60("concat('bs|', cast(_b as string), '|', cast(_id as string))")} % 1000 as _u")
      .selectExpr("_g", "_b", "_x",
        "case when _u < 368 then 0 when _u < 736 then 1 " +
          "when _u < 920 then 2 when _u < 981 then 3 else 4 end as _w")
      .groupBy("_g", "_b")
      .agg(sum(expr("_w * _x")).cast("long").as("_swx"),
        sum("_w").cast("long").as("_sw"))
      .selectExpr("_g", "_b",
        "case when _sw = 0 then 0 else (100 * _swx) div _sw end as _m")
      .selectExpr("_g", "_m",
        "row_number() over (partition by _g order by _m asc, _b asc) as _ra",
        "row_number() over (partition by _g order by _m desc, _b desc) as _rd")
    val bounds = reps.groupBy("_g")
      .agg(max(when(col("_ra") === 2, col("_m"))).as("lo_x100"),
        max(when(col("_rd") === 2, col("_m"))).as("hi_x100"))
    docs.selectExpr(s"$groupCol as _g", s"cast($valueCol as bigint) as _x")
      .groupBy("_g")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        expr("(100 * sum(_x)) div count(1)").as("mean_x100"))
      .join(bounds, "_g")
      .selectExpr(s"_g as $groupCol", "n_docs", "mean_x100",
        "lo_x100", "hi_x100", "hi_x100 - lo_x100 as width_x100")
  }
}
