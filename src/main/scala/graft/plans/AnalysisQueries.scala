package graft.plans

import graft.{Portable => P, Q, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational renderings of the reference's analysis operators (SURVEY
  * §2.c) — the shapes that ARE expressible as pure SQL over test tables.
  * The full analysis engine (ranked bottleneck table over live pipeline
  * metrics, LP solvers, cache placement) lives in graft.plans/graft.solver
  * and is golden-tested in ScalaTest; these queries pin the relational
  * semantics against DuckDB.
  */
object AnalysisQueries {

  val queries: Seq[Q] = Seq(

    // A4 shape (graph_rewrites.py:333-441): per-group derived rate metric,
    // ranked ascending — the "ranked bottleneck table" as a relational op.
    Q(
      "an01_ranked_rates",
      """WITH m AS (
        |  SELECT l_returnflag AS opflag, l_linestatus AS opstatus,
        |    count(*) AS elems,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS work
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT opflag, opstatus, elems,
        |  CAST(row_number() OVER (ORDER BY elems / work, opflag, opstatus) AS BIGINT) AS rank
        |FROM m""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .groupBy(col("l_returnflag").as("opflag"), col("l_linestatus").as("opstatus"))
        .agg(count(lit(1)).as("elems"), expr(P.dsum("l_extendedprice")).as("work"))
        .withColumn(
          "rank",
          row_number()
            .over(Window.orderBy(col("elems") / col("work"), col("opflag"), col("opstatus")))
            .cast("long"))
        .select("opflag", "opstatus", "elems", "rank")
    },

    // A5 (graph_rewrites.py:266-320): span aggregation + outlier detection
    // — group spans by name, mean/σ from exact sums, flag dt > mean + 2σ.
    Q(
      "an02_span_outliers",
      """WITH stats AS (
        |  SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sm,
        |    CAST(SUM(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS s2,
        |    count(*) AS n
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type
        |FROM events e JOIN stats s ON e.event_type = s.event_type
        |WHERE s.n > 1 AND e.value > s.sm / s.n +
        |  2 * sqrt(greatest(CAST(0 AS DOUBLE), (s.s2 - s.sm * s.sm / s.n) / (s.n - 1)))""".stripMargin) {
      (s, d) =>
        val ev = T.events(s, d)
        val stats = ev.groupBy("event_type").agg(
          expr(P.dsum("value")).as("sm"),
          expr("cast(sum(cast(value * value as decimal(38,10))) as double)").as("s2"),
          count(lit(1)).as("n"))
        ev.join(broadcast(stats), "event_type")
          .filter(
            col("n") > 1 && col("value") >
              col("sm") / col("n") + lit(2) * sqrt(greatest(
                lit(0.0),
                (col("s2") - col("sm") * col("sm") / col("n")) / (col("n") - 1))))
          .select("event_id", "event_type")
    },

    // A3 (graphdef_util.py:739-753): canonical `Base_k` renaming by
    // topological order, over a literal node table.
    Q(
      "an03_canonical_rename",
      """WITH nodes(id, base, topo) AS (VALUES
        |  (1, 'Map', 3), (2, 'Map', 1), (3, 'Batch', 2),
        |  (4, 'Map', 5), (5, 'Prefetch', 4), (6, 'Batch', 6))
        |SELECT id, base || '_' ||
        |  CAST(row_number() OVER (PARTITION BY base ORDER BY topo) - 1 AS VARCHAR) AS cname
        |FROM nodes""".stripMargin) { (s, _) =>
      import s.implicits._
      Seq((1, "Map", 3), (2, "Map", 1), (3, "Batch", 2),
        (4, "Map", 5), (5, "Prefetch", 4), (6, "Batch", 6))
        .toDF("id", "base", "topo")
        .withColumn(
          "k",
          row_number().over(Window.partitionBy("base").orderBy("topo")) - 1)
        .selectExpr("id", "concat(base, '_', cast(k as string)) as cname")
    },

    // A21 (graph_rewrites.py:489-493): dataset cardinality inventory.
    Q(
      "an04_table_cardinalities",
      """SELECT 'lineitem' AS tname, count(*) AS n FROM lineitem
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |UNION ALL SELECT 'customer', count(*) FROM customer
        |UNION ALL SELECT 'documents', count(*) FROM documents
        |UNION ALL SELECT 'events', count(*) FROM events""".stripMargin) { (s, d) =>
      def c(n: String) = T.t(s, d, n).agg(count(lit(1)).as("n")).withColumn("tname", lit(n))
      c("lineitem").unionByName(c("orders")).unionByName(c("customer"))
        .unionByName(c("documents")).unionByName(c("events"))
        .select("tname", "n")
    },

    // A8/A21 (graph_rewrites.py:707-712): per-source working-set size —
    // the byte estimate the cache planner compares against 0.9·memory.
    Q(
      "an05_working_set",
      """SELECT source, count(*) AS n_docs,
        |  CAST(SUM(CAST(strlen(text) AS BIGINT)) AS BIGINT) AS bytes
        |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(expr("cast(octet_length(text) as bigint)")).as("bytes"))
    },

    // Column profiling for training-data QA: per-column counts, null
    // rates, ranges, exact distincts over the fact table.
    Q(
      "an06_column_profile",
      """SELECT count(*) AS n_rows,
        |  CAST(count(*) - count(l_quantity) AS BIGINT) AS qty_nulls,
        |  min(l_quantity) AS qty_min, max(l_quantity) AS qty_max,
        |  count(DISTINCT l_returnflag) AS flag_distinct,
        |  count(DISTINCT l_partkey) AS part_distinct,
        |  min(l_extendedprice) AS price_min, max(l_extendedprice) AS price_max
        |FROM lineitem""".stripMargin) { (s, d) =>
      T.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("l_quantity"))).cast("long").as("qty_nulls"),
        min("l_quantity").as("qty_min"),
        max("l_quantity").as("qty_max"),
        countDistinct("l_returnflag").as("flag_distinct"),
        countDistinct("l_partkey").as("part_distinct"),
        min("l_extendedprice").as("price_min"),
        max("l_extendedprice").as("price_max"))
    },

    // Approximate profile — the scale path for 100 TB profiling, now
    // built ENTIRELY from bit-portable approximations so the gate
    // hash-matches it (formerly t-digest + HLL, whose sketches differ
    // per engine and forced a rows-only gate):
    //   - quantiles by LOWER-NEAREST-RANK SELECTION (index
    //     ⌊p·(n−1)⌋ of the sorted sample — pure element pick, no float
    //     interpolation whose IEEE expression could differ per engine)
    //     over a KMV-STYLE FIXED sample: the 1024 rows with the
    //     smallest row-key hashes (ties broken by price). TRULY bounded
    //     memory — the sample is a per-partition top-k (TakeOrdered),
    //     the rank window orders ≤ 1024 rows, and the sample size is
    //     corpus-independent, unlike an exact percentile over a
    //     fractional sample (which buffers O(sample) values in one
    //     aggregation buffer);
    //   - distinct parts from the an17 KMV estimator (k=32 minimum
    //     60-bit hashes, (k−1)·2⁶⁰/h₍ₖ₎ in DECIMAL(38,0)/HUGEINT);
    //   - qty_mean as one IEEE divide of an exact DECIMAL sum by the
    //     exact count (raw SUM(double) would vary with partial-agg
    //     order).
    // Scale: both sketches are per-partition top-k merges; the
    // distinct-hash frame partial-aggregates map-side; no global sort
    // anywhere near the corpus.
    Q(
      "an07_approx_profile",
      s"""WITH smp AS (SELECT l_extendedprice AS p FROM lineitem
         |    ORDER BY ${P.duckHash60("'smp|' || CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)")}, l_extendedprice
         |    LIMIT 1024),
         |  o AS (SELECT p, row_number() OVER (ORDER BY p) AS rn,
         |          count(*) OVER () AS ns FROM smp),
         |  q AS (SELECT
         |      max(CASE WHEN rn = 1 + CAST(floor(0.25 * (ns - 1)) AS BIGINT) THEN p END) AS price_p25,
         |      max(CASE WHEN rn = 1 + CAST(floor(0.50 * (ns - 1)) AS BIGINT) THEN p END) AS price_p50,
         |      max(CASE WHEN rn = 1 + CAST(floor(0.75 * (ns - 1)) AS BIGINT) THEN p END) AS price_p75,
         |      max(CASE WHEN rn = 1 + CAST(floor(0.99 * (ns - 1)) AS BIGINT) THEN p END) AS price_p99,
         |      CAST(max(ns) AS BIGINT) AS n_sample
         |    FROM o),
         |  t AS (SELECT DISTINCT ${P.duckHash60("'kmv|' || CAST(l_partkey AS VARCHAR)")} AS h FROM lineitem),
         |  k AS (SELECT max(h) AS kth FROM (SELECT h FROM t ORDER BY h LIMIT 32)),
         |  n AS (SELECT CAST(count(*) AS BIGINT) AS nh FROM t),
         |  m AS (SELECT ${P.duckDsum("l_quantity")} AS qsum,
         |          CAST(count(*) AS BIGINT) AS n_rows FROM lineitem)
         |SELECT price_p25, price_p50, price_p75, price_p99, n_sample,
         |  CASE WHEN nh < 32 THEN nh
         |       ELSE CAST(35740566642812256256 // kth AS BIGINT) END AS part_approx_distinct,
         |  qsum / n_rows AS qty_mean, n_rows
         |FROM q CROSS JOIN k CROSS JOIN n CROSS JOIN m""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val li = T.lineitem(s, d)
      // spread: the sample branch pays one md5 per ROW before its
      // TakeOrdered, and the 3-split fixture scan ran it on 3 tasks (r18)
      val smp = T.spread(li)
        .selectExpr("l_extendedprice as p",
          s"${P.hash60("concat('smp|', cast(l_orderkey as string), '|', cast(l_linenumber as string))")} as hh")
        .orderBy(col("hh"), col("p")).limit(1024)
      // rank window over the ≤1024-row sample (TakeOrdered below it, so
      // the PlanQuality global-window rail sees a bounded input)
      val q = smp
        .withColumn("rn", row_number().over(Window.orderBy("p")))
        .withColumn("ns", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .agg(
          max(expr("case when rn = 1 + cast(floor(0.25 * (ns - 1)) as bigint) then p end")).as("price_p25"),
          max(expr("case when rn = 1 + cast(floor(0.50 * (ns - 1)) as bigint) then p end")).as("price_p50"),
          max(expr("case when rn = 1 + cast(floor(0.75 * (ns - 1)) as bigint) then p end")).as("price_p75"),
          max(expr("case when rn = 1 + cast(floor(0.99 * (ns - 1)) as bigint) then p end")).as("price_p99"),
          max("ns").cast("long").as("n_sample"))
      // persisted: kth-min + count branches don't share the distinct
      // exchange (no ReusedExchange — see q_approx_distinct); caller
      // clearCache releases.
      // Hash AFTER the key-level distinct (the q_approx_distinct r15 #6
      // convention, applied here r18): md5 once per distinct key (~20k)
      // instead of once per row (600k); the outer distinct keeps the
      // oracle's exact distinct-hash semantics under a 60-bit collision.
      val t = li
        .select("l_partkey").distinct()
        .selectExpr(s"${P.hash60("concat('kmv|', cast(l_partkey as string))")} as h")
        .distinct()
        .persist()
      val k32 = t.orderBy("h").limit(32).agg(max("h").as("kth"))
      val nh = t.agg(count(lit(1)).cast("long").as("nh"))
      val m = li.agg(expr(P.dsum("l_quantity")).as("qsum"),
        count(lit(1)).cast("long").as("n_rows"))
      q.crossJoin(broadcast(k32)).crossJoin(broadcast(nh)).crossJoin(broadcast(m))
        .selectExpr("price_p25", "price_p50", "price_p75", "price_p99",
          "n_sample",
          "case when nh < 32 then nh " +
            "else cast(cast('35740566642812256256' as decimal(38,0)) " +
            "div kth as bigint) end as part_approx_distinct",
          "qsum / n_rows as qty_mean", "n_rows")
    },

    // Exact equi-width histogram of order value (50k buckets) with bucket
    // boundaries realized from data — the distribution profile a skew
    // diagnosis starts from. One map-side-combined aggregation; the
    // bucket id is floor of one exact IEEE division, portable.
    Q(
      "an08_value_histogram",
      """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  count(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
      T.orders(s, d)
        .groupBy(expr("cast(floor(o_totalprice / 50000.0) as bigint)").as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          min("o_totalprice").as("lo"),
          max("o_totalprice").as("hi"))
    },

    // Exact interpolated quantiles (percentile ≡ quantile_cont: both
    // engines sort and linearly interpolate at (n−1)·q, so even the
    // interpolated doubles hash-match). The exact complement to an07's
    // sketches — at 100 TB you'd reach for the sketch; the exact path is
    // the ground truth it's validated against.
    Q(
      "an09_exact_quantiles",
      """SELECT l_returnflag, count(*) AS n,
        |  quantile_cont(l_quantity, 0.5) AS med,
        |  quantile_cont(l_quantity, 0.95) AS p95
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          expr("percentile(l_quantity, 0.5)").as("med"),
          expr("percentile(l_quantity, 0.95)").as("p95"))
    },

    // Exact frequent-items over the token stream: every token with
    // corpus support > 3.3% (the vocab heavy-hitters a tokenizer build
    // or stopword audit starts from). Two-phase plan: tokens partial-
    // aggregate map-side down to ≤ |vocab| rows before their one
    // exchange; the corpus total is a second aggregation over that tiny
    // counts frame (NOT a second corpus scan) and broadcasts back into
    // the threshold filter. At 100 TB the same plan holds — the heavy
    // cost is the token explode, which stays scan-local; a Misra-Gries
    // sketch inside mapPartitions is the sublinear-memory alternative
    // when |vocab| itself explodes, validated against this exact path.
    Q(
      "an10_heavy_hitters",
      """WITH ex AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |            FROM documents),
        |     c AS (SELECT w, count(*) AS cnt FROM ex GROUP BY w),
        |     t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c)
        |SELECT w AS token, cnt, (10000 * cnt) // (SELECT n FROM t) AS share_bp
        |FROM c WHERE 10000 * cnt > 330 * (SELECT n FROM t)""".stripMargin) { (s, d) =>
      val counts = T.documents(s, d)
        .selectExpr("explode(split(lower(text), '\\\\s+')) as w")
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum("cnt").cast("bigint").as("n"))
      counts.crossJoin(broadcast(total))
        .filter(expr("10000 * cnt > 330 * n"))
        .selectExpr("w as token", "cnt", "(10000 * cnt) div n as share_bp")
    },

    // Zipf octave profile: rank tokens by frequency, bucket ranks into
    // octaves (bucket k = ranks in [2^k, 2^(k+1))), report types/mass per
    // octave. Under Zipf's law each octave carries roughly constant mass,
    // so the profile is the standard "is this corpus natural text?"
    // diagnostic — and it is transcendental-free: floor(log2(rank)) is
    // length(bin(rank))-1, exact integers on both engines (the repo's
    // no-ln/exp/pow portability rule; see tx07's scaladoc).
    //
    // Scale notes (100 TB): token counts combine map-side to vocab-bounded
    // rows; the vocab table is still millions of types at corpus scale, so
    // the rank rides the distributed Ordinal (quantile-bucketed ranks on
    // -freq + broadcast prefix offsets) instead of a single-partition
    // `row_number() OVER (ORDER BY freq DESC)` — the same entity-scale
    // window funnel the r12 verdict flagged in sm13; octave rollup is a
    // ≤64-row agg. Text never shuffles.
    Q(
      "an11_zipf_octaves",
      """WITH w AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |           FROM documents),
        |     f AS (SELECT w, count(*)::BIGINT AS freq FROM w GROUP BY w),
        |     r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, w) AS rank FROM f)
        |SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS octave,
        |  count(*)::BIGINT AS n_types, SUM(freq)::BIGINT AS mass,
        |  CAST(SUM(freq) AS DOUBLE) / count(*) AS mean_freq
        |FROM r GROUP BY octave""".stripMargin) { (s, d) =>
      graft.operators.Ordinal.withGlobalOrdinal(
        T.documents(s, d)
          .selectExpr("explode(split(lower(text), '\\\\s+')) as w")
          .groupBy("w").agg(count(lit(1)).as("freq"))
          // read twice (quantile sketch + rank); caller clearCache releases
          .persist()
          // freq DESC ≡ -freq ASC: Ordinal buckets/orders ascending only
          .withColumn("_negfreq", -col("freq")),
        "_negfreq", "rank", tieCols = Seq("w"))
        .selectExpr("freq", "cast(length(bin(rank)) - 1 as bigint) as octave")
        .groupBy("octave")
        .agg(
          count(lit(1)).cast("long").as("n_types"),
          sum("freq").cast("long").as("mass"),
          expr("cast(sum(freq) as double) / count(1)").as("mean_freq"))
    },

    // Declarative data-quality audit (the Deequ-style constraint check a
    // 100 TB ingest runs before training): one row per rule with checked/
    // violation counts — range rules, null rules, a PK-uniqueness rule,
    // and two referential-integrity rules (orphan foreign keys via outer
    // joins). A clean corpus legitimately reports zeros; the short-text
    // and mixed-language rules fire on this corpus so the audit's
    // discrimination is itself gated.
    //
    // Scale notes (100 TB): every per-table rule is one map-side-combined
    // agg over its scan (all rules for a table share the pass); the RI
    // rules shuffle only the key columns. Output is O(#rules).
    Q(
      "an12_constraint_audit",
      """SELECT 'documents.min_length_200' AS rule, count(*)::BIGINT AS checked,
        |  count(CASE WHEN n_chars < 200 THEN 1 END)::BIGINT AS violations FROM documents
        |UNION ALL
        |SELECT 'documents.english_only', count(*)::BIGINT,
        |  count(CASE WHEN lang <> 'en' THEN 1 END)::BIGINT FROM documents
        |UNION ALL
        |SELECT 'events.value_nonneg', count(*)::BIGINT,
        |  count(CASE WHEN value < 0 OR value IS NULL THEN 1 END)::BIGINT FROM events
        |UNION ALL
        |SELECT 'lineitem.orphan_orderkey', count(*)::BIGINT,
        |  count(CASE WHEN o_orderkey IS NULL THEN 1 END)::BIGINT
        |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |UNION ALL
        |SELECT 'lineitem.quantity_range_1_50', count(*)::BIGINT,
        |  count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)::BIGINT FROM lineitem
        |UNION ALL
        |SELECT 'orders.orphan_custkey', count(*)::BIGINT,
        |  count(CASE WHEN c_custkey IS NULL THEN 1 END)::BIGINT
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |UNION ALL
        |SELECT 'orders.pk_unique', count(*)::BIGINT,
        |  (count(*) - count(DISTINCT o_orderkey))::BIGINT FROM orders""".stripMargin) { (s, d) =>
      def rule(df: org.apache.spark.sql.DataFrame, name: String, violated: String) =
        df.agg(
          count(lit(1)).cast("long").as("checked"),
          count(when(expr(violated), 1)).cast("long").as("violations"))
          .select(lit(name).as("rule"), col("checked"), col("violations"))
      val docs = T.documents(s, d)
      val li = T.lineitem(s, d)
      val ord = T.orders(s, d)
      rule(docs, "documents.min_length_200", "n_chars < 200")
        .unionAll(rule(docs, "documents.english_only", "lang <> 'en'"))
        .unionAll(rule(T.events(s, d), "events.value_nonneg",
          "value < 0 or value is null"))
        .unionAll(rule(
          li.join(ord.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left"),
          "lineitem.orphan_orderkey", "o_orderkey is null"))
        .unionAll(rule(li, "lineitem.quantity_range_1_50",
          "l_quantity < 1 or l_quantity > 50"))
        .unionAll(rule(
          ord.join(broadcast(T.customer(s, d).select("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left"),
          "orders.orphan_custkey", "c_custkey is null"))
        .unionAll(
          ord.agg(
            count(lit(1)).cast("long").as("checked"),
            (count(lit(1)) - countDistinct("o_orderkey")).cast("long").as("violations"))
            .select(lit("orders.pk_unique").as("rule"), col("checked"), col("violations")))
    },

    // Two-sample distribution drift (the data-drift monitor a 100 TB
    // ingest runs between snapshots): split events by event-time halves,
    // bin `value` into 10 equal-width bins sized on the REFERENCE half's
    // [min, max] (cur rows outside clamp to the edge bins), and report
    // per-bin counts, ppm shares, and the χ² drift term
    // (n_ref − n_cur)²/(n_ref + n_cur) — the transcendental-free drift
    // statistic (PSI's ln(p/q) is not bit-portable across engines; χ²
    // orders drifts identically). Each term is ONE IEEE division of
    // exact integers quantized to DECIMAL(28,8), so engines agree
    // bit-for-bit.
    //
    // Scale notes (100 TB): the time midpoint and the reference extrema
    // are map-side-combined scalar aggs broadcast back; bin assignment
    // is then a scan-local projection, and the 10-bin rollup partial-
    // aggregates map-side. Equal-width (not quantile) bins are the
    // deliberate scale choice: boundaries need O(1) state, no global
    // rank — a quantile-binned variant plugs an09's exact-quantile
    // machinery into the same rollup.
    Q(
      "an13_value_drift",
      """WITH e AS (SELECT epoch_us(ts) AS ts_us, value FROM events),
        |     m AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS mid FROM e),
        |     tg AS (SELECT value,
        |              CASE WHEN ts_us <= (SELECT mid FROM m) THEN 0 ELSE 1 END AS side
        |            FROM e),
        |     g AS (SELECT min(value) AS vmin, max(value) AS vmax
        |           FROM tg WHERE side = 0),
        |     b AS (SELECT side,
        |             least(9, greatest(0, CAST(floor((value - (SELECT vmin FROM g)) * 10
        |               / ((SELECT vmax FROM g) - (SELECT vmin FROM g))) AS BIGINT))) AS bin
        |           FROM tg),
        |     t AS (SELECT bin,
        |             coalesce(SUM(CASE WHEN side = 0 THEN 1 END), 0)::BIGINT AS n_ref,
        |             coalesce(SUM(CASE WHEN side = 1 THEN 1 END), 0)::BIGINT AS n_cur
        |           FROM b GROUP BY bin)
        |SELECT bin, n_ref, n_cur,
        |  CAST(1000000::HUGEINT * n_ref // (SUM(n_ref) OVER ()) AS BIGINT) AS share_ref_ppm,
        |  CAST(1000000::HUGEINT * n_cur // (SUM(n_cur) OVER ()) AS BIGINT) AS share_cur_ppm,
        |  CAST(CAST(CAST(n_ref - n_cur AS DOUBLE) * (n_ref - n_cur)
        |    / (n_ref + n_cur) AS DECIMAL(28,8)) AS DOUBLE) AS chi2_term
        |FROM t""".stripMargin) { (s, d) =>
      val e = T.events(s, d).selectExpr("unix_micros(ts) as ts_us", "value")
      val mid = e.agg(expr("(min(ts_us) + max(ts_us)) div 2").as("mid"))
      val tagged = e.crossJoin(broadcast(mid))
        .selectExpr("value", "case when ts_us <= mid then 0 else 1 end as side")
      val g = tagged.filter(col("side") === 0)
        .agg(min("value").as("vmin"), max("value").as("vmax"))
      tagged.crossJoin(broadcast(g))
        .selectExpr("side",
          "least(9, greatest(0, cast(floor((value - vmin) * 10 / (vmax - vmin)) as bigint))) as bin")
        .groupBy("bin")
        .agg(
          coalesce(sum(when(col("side") === 0, 1L)), lit(0L)).cast("long").as("n_ref"),
          coalesce(sum(when(col("side") === 1, 1L)), lit(0L)).cast("long").as("n_cur"))
        // ppm in DECIMAL(38,0)/HUGEINT (the an17 convention) and the χ²
        // square with one factor pre-cast to double: both BIGINT forms
        // overflow at corpus-scale per-bin counts (1e6·n and (Δn)²)
        .selectExpr("bin", "n_ref", "n_cur",
          "cast(cast(1000000 as decimal(38,0)) * n_ref " +
            "div (sum(n_ref) over ()) as bigint) as share_ref_ppm",
          "cast(cast(1000000 as decimal(38,0)) * n_cur " +
            "div (sum(n_cur) over ()) as bigint) as share_cur_ppm",
          "cast(cast(cast(n_ref - n_cur as double) * (n_ref - n_cur) " +
            "/ (n_ref + n_cur) as decimal(28,8)) as double) as chi2_term")
    },

    // Ordered conversion funnel: users reaching view → click-after-view
    // → purchase-after-click, with conversion ppm vs the funnel top —
    // the product-analytics staple, built as three keyed min-aggs (each
    // stage = min event time STRICTLY after the previous stage's entry
    // time, so ordering is enforced, not just co-occurrence).
    //
    // Scale notes (100 TB): each stage is a map-side-combined per-user
    // min + one user-keyed join — (user_id, ts) longs only; the three
    // stage counts are scalar aggs; output is O(#stages).
    Q(
      "an14_funnel",
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |  c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |        FROM events e JOIN v ON v.user_id = e.user_id
        |        WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
        |        GROUP BY e.user_id),
        |  p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        |        FROM events e JOIN c ON c.user_id = e.user_id
        |        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
        |        GROUP BY e.user_id),
        |  n AS (SELECT (SELECT count(*) FROM v)::BIGINT AS nv,
        |               (SELECT count(*) FROM c)::BIGINT AS nc,
        |               (SELECT count(*) FROM p)::BIGINT AS np)
        |SELECT 1::BIGINT AS stage, 'view' AS event_type, nv AS n_users,
        |       1000000::BIGINT AS conv_ppm FROM n
        |UNION ALL SELECT 2, 'click', nc, (1000000 * nc) // nv FROM n
        |UNION ALL SELECT 3, 'purchase', np, (1000000 * np) // nv FROM n""".stripMargin) {
      (s, d) =>
        val e = T.events(s, d).selectExpr("user_id", "event_type",
          "unix_micros(ts) as ts_us")
        val v = e.filter("event_type = 'view'")
          .groupBy("user_id").agg(min("ts_us").as("t1"))
        val c = e.filter("event_type = 'click'")
          .join(v, "user_id").filter(col("ts_us") > col("t1"))
          .groupBy("user_id").agg(min("ts_us").as("t2"))
        val p = e.filter("event_type = 'purchase'")
          .join(c, "user_id").filter(col("ts_us") > col("t2"))
          .groupBy("user_id").agg(min("ts_us").as("t3"))
        val n = v.agg(count(lit(1)).cast("long").as("nv"))
          .crossJoin(c.agg(count(lit(1)).cast("long").as("nc")))
          .crossJoin(p.agg(count(lit(1)).cast("long").as("np")))
        n.selectExpr("cast(1 as bigint) as stage", "'view' as event_type",
          "nv as n_users", "cast(1000000 as bigint) as conv_ppm")
          .unionAll(n.selectExpr("cast(2 as bigint)", "'click'", "nc",
            "(1000000 * nc) div nv"))
          .unionAll(n.selectExpr("cast(3 as bigint)", "'purchase'", "np",
            "(1000000 * np) div nv"))
    },

    // Join-cardinality probe: PREDICT an equi-join's output size from
    // per-side key histograms (Σ_k n_left(k)·n_right(k)) before paying
    // for the join — the should-I-broadcast/salt decision sm03's skew
    // profile feeds, made quantitative. Output: the top-5 contributing
    // keys with their share of the predicted output (the skew story: a
    // key with share_ppm ≫ 1/|keys| is the salting candidate), a
    // 'total' row with the prediction, and an 'actual' row from running
    // the join — for an inner equi-join the histogram prediction is
    // EXACT, so the gate pins predicted ≡ actual. Scale: the probe costs
    // two map-side-combined key-count aggs + a |keys|-row join — orders
    // of magnitude cheaper than the join it sizes; the actual-join arm
    // exists only for the audit.
    Q(
      "an15_join_cardinality",
      """WITH o AS (SELECT o_custkey AS key, count(*)::BIGINT AS n_left
        |           FROM orders GROUP BY 1),
        |  e AS (SELECT user_id AS key, count(*)::BIGINT AS n_right
        |        FROM events GROUP BY 1),
        |  c AS (SELECT o.key, n_left, n_right, n_left * n_right AS predicted
        |        FROM o JOIN e ON e.key = o.key),
        |  t AS (SELECT CAST(SUM(predicted) AS BIGINT) AS tp FROM c),
        |  a AS (SELECT count(*)::BIGINT AS n
        |        FROM orders JOIN events ON user_id = o_custkey),
        |  top5 AS (SELECT key, n_left, n_right, predicted
        |           FROM c ORDER BY predicted DESC, key LIMIT 5)
        |SELECT 'key' AS part, key, n_left, n_right, predicted,
        |  CAST(1000000::HUGEINT * predicted // (SELECT tp FROM t) AS BIGINT) AS share_ppm FROM top5
        |UNION ALL
        |SELECT 'total', -1::BIGINT, 0::BIGINT, 0::BIGINT, tp, 1000000::BIGINT FROM t
        |UNION ALL
        |SELECT 'actual', -1::BIGINT, 0::BIGINT, 0::BIGINT, n, 1000000::BIGINT FROM a""".stripMargin) {
      (s, d) =>
        val o = T.orders(s, d).groupBy(col("o_custkey").as("key"))
          .agg(count(lit(1)).cast("long").as("n_left"))
        val e = T.events(s, d).groupBy(col("user_id").as("key"))
          .agg(count(lit(1)).cast("long").as("n_right"))
        val c = o.join(e, "key")
          .selectExpr("key", "n_left", "n_right",
            "n_left * n_right as predicted")
        val t = c.agg(sum("predicted").cast("long").as("tp"))
        val actual = T.orders(s, d).select(col("o_custkey").as("key"))
          .join(T.events(s, d).select(col("user_id").as("key")), "key")
          .agg(count(lit(1)).cast("long").as("n"))
        val top5 = c.orderBy(col("predicted").desc, col("key")).limit(5)
          .crossJoin(broadcast(t))
          // ppm in DECIMAL(38,0)/HUGEINT: a skew probe's predicted join
          // output routinely exceeds 9.2e12 rows at corpus scale, where
          // 1e6·predicted would overflow BIGINT
          .selectExpr("'key' as part", "key", "n_left", "n_right",
            "predicted",
            "cast(cast(1000000 as decimal(38,0)) * predicted " +
              "div tp as bigint) as share_ppm")
        top5
          .unionAll(t.selectExpr("'total' as part", "cast(-1 as bigint) as key",
            "cast(0 as bigint)", "cast(0 as bigint)", "tp",
            "cast(1000000 as bigint)"))
          .unionAll(actual.selectExpr("'actual' as part", "cast(-1 as bigint) as key",
            "cast(0 as bigint)", "cast(0 as bigint)", "n",
            "cast(1000000 as bigint)"))
    },

    // Token-distribution drift between two corpus slices (en vs the
    // rest): per top-40 global token, the total-variation contribution
    // |p_en − p_rest| / 2 in ppm — the mixture-shift audit you run when
    // a new crawl snapshot lands (an13 covers numeric columns; this is
    // the text twin). ALL-INTEGER cross-multiplication: the contribution
    // is |c_en·T_rest − c_rest·T_en| scaled against 2·T_en·T_rest, so
    // there is no float division to flake the hash gate; the products
    // run in DECIMAL(38,0)/HUGEINT since count×total clears 2^63 at
    // corpus scale. Scale: one tokenize scan feeds
    // both slice rollups (map-side combined, (token, 2 longs) rows);
    // the top-40 is TakeOrderedAndProject; totals broadcast back.
    Q(
      "an16_token_tv_drift",
      """WITH tok AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
        |    unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |  FROM documents),
        |  c AS (SELECT w, SUM(is_en)::BIGINT AS c_en,
        |          SUM(1 - is_en)::BIGINT AS c_rest FROM tok GROUP BY w),
        |  tot AS (SELECT SUM(c_en) AS t_en, SUM(c_rest) AS t_rest FROM c),
        |  top AS (SELECT w, c_en, c_rest FROM c
        |          ORDER BY c_en + c_rest DESC, w LIMIT 40)
        |SELECT w AS token, c_en, c_rest,
        |  CAST(1000000::HUGEINT * abs(CAST(c_en AS HUGEINT) * t_rest - CAST(c_rest AS HUGEINT) * t_en)
        |    // (2::HUGEINT * t_en * t_rest) AS BIGINT) AS drift_ppm
        |FROM top CROSS JOIN tot""".stripMargin) { (s, d) =>
      val tok = T.documents(s, d)
        .selectExpr("case when lang = 'en' then 1 else 0 end as is_en",
          "explode(split(lower(text), '\\\\s+')) as w")
      val c = tok.groupBy("w")
        .agg(sum("is_en").cast("long").as("c_en"),
          sum(expr("1 - is_en")).cast("long").as("c_rest"))
        .persist() // feeds totals + top-40; caller clearCache releases
      val tot = c.agg(sum("c_en").as("t_en"), sum("c_rest").as("t_rest"))
      c.orderBy((col("c_en") + col("c_rest")).desc, col("w"))
        .limit(40)
        .crossJoin(broadcast(tot))
        // cross-products in DECIMAL(38,0)/HUGEINT: token-count × corpus
        // totals overflows BIGINT long before 100 TB (the an18 lesson)
        .selectExpr("w as token", "c_en", "c_rest",
          "cast(cast(1000000 as decimal(38,0)) " +
            "* abs(cast(c_en as decimal(38,0)) * t_rest " +
            "- cast(c_rest as decimal(38,0)) * t_en) " +
            "div (cast(2 as decimal(38,0)) * t_en * t_rest) as bigint) as drift_ppm")
    },

    // KMV (k-minimum-values) distinct-cardinality estimation, per
    // source: the k=32 smallest 60-bit token hashes give the classic
    // unbiased estimator (k−1)·2⁶⁰/h₍ₖ₎ — distinct-count sketching with
    // the SAME md5 hash machinery the dedup family already rides, and
    // (unlike HLL's approx_count_distinct) bit-portable across engines,
    // so the gate pins estimate AND error against the exact count.
    // The numerator (k−1)·2⁶⁰ ≈ 3.6e19 exceeds BIGINT, so the division
    // runs in WIDE integers — a DECIMAL(38,0) literal on Spark, HUGEINT
    // on DuckDB — with one exact floor-divide (a first cut split into
    // quot/rem halves, but the remainder term (k−1)·r itself overflows
    // whenever h₍ₖ₎ > 2⁶³/(k−1), i.e. for any source with ≲120 distinct
    // tokens — found in review, reproduced as a DuckDB overflow error).
    // Sources with
    // fewer than k distinct hashes fall back to the exact count (the
    // estimator is undefined there). Scale: the distinct (source, hash)
    // frame partial-aggregates map-side to vocabulary size before the
    // one exchange; the rank window orders that vocab-bound frame, never
    // the corpus — and at extreme scale the same estimator composes as
    // per-partition top-k then merge, which this plan's AQE-coalesced
    // window already approximates.
    Q(
      "an17_kmv_cardinality",
      s"""WITH tok AS (SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |             FROM documents),
         |  t AS (SELECT DISTINCT source, ${P.duckHash60("'kmv|' || w")} AS h FROM tok),
         |  r AS (SELECT source, h,
         |          row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM t),
         |  a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact,
         |          max(CASE WHEN rn = 32 THEN h END) AS kth
         |        FROM r GROUP BY source),
         |  e AS (SELECT source, n_exact,
         |          CASE WHEN n_exact < 32 THEN n_exact
         |               ELSE CAST(35740566642812256256 // kth AS BIGINT) END AS n_est
         |        FROM a)
         |SELECT source, CAST(32 AS BIGINT) AS k, n_exact, n_est,
         |  (abs(n_est - n_exact) * 10000) // n_exact AS err_bp
         |FROM e""".stripMargin) { (s, d) =>
      // md5 AFTER the (source, token) distinct (the q_approx_distinct
      // r16 convention): hashing the raw token stream pays md5 once per
      // OCCURRENCE; the distinct first cuts that to once per vocabulary
      // entry, and the outer distinct keeps the oracle's exact
      // distinct-hash semantics under a 60-bit collision
      val t = T.documents(s, d)
        .selectExpr("source", "explode(split(lower(text), '\\\\s+')) as w")
        .distinct()
        .selectExpr("source", s"${P.hash60("concat('kmv|', w)")} as h")
        .distinct()
      t.withColumn("rn",
          row_number().over(Window.partitionBy("source").orderBy("h")))
        .groupBy("source")
        .agg(
          count(lit(1)).cast("long").as("n_exact"),
          max(when(col("rn") === 32, col("h"))).as("kth"))
        .selectExpr("source", "cast(32 as bigint) as k", "n_exact",
          "case when n_exact < 32 then n_exact " +
            "else cast(cast('35740566642812256256' as decimal(38,0)) " +
            "div kth as bigint) end as n_est")
        .selectExpr("source", "k", "n_exact", "n_est",
          "(abs(n_est - n_exact) * 10000) div n_exact as err_bp")
    },

    // Exact two-sample Kolmogorov–Smirnov drift, each source vs the
    // REST of the corpus over the doc-size distribution: the
    // which-source-looks-different audit that complements an13's
    // binned χ² (KS needs no binning choice and catches shape drift χ²
    // bins can blur). The statistic is computed EXACTLY in integers —
    // D's numerator |F₁·n₂ − F₂·n₁| maxes over the merged value grid,
    // then one division to ppm — never IEEE CDF subtraction, so both
    // engines agree bit-for-bit. Scale: per-(source, value) counts
    // partial-aggregate map-side; the evaluation grid is sources ×
    // distinct values (values quantize to a bounded grid at real scale
    // — n_chars here is already integral), and the running-sum windows
    // order that grid, never the corpus.
    Q(
      "an18_ks_drift",
      """WITH cnt AS (SELECT source, n_chars AS v, count(*) AS c
        |             FROM documents GROUP BY source, v),
        |  tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n1
        |          FROM documents GROUP BY source),
        |  n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
        |  vals AS (SELECT DISTINCT n_chars AS v FROM documents),
        |  allc AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY v),
        |  grid AS (SELECT s.source, a.v, coalesce(c.c, 0) AS cs
        |           FROM (SELECT DISTINCT source FROM documents) s
        |           CROSS JOIN vals a
        |           LEFT JOIN cnt c ON c.source = s.source AND c.v = a.v),
        |  cum AS (SELECT source, v,
        |            SUM(cs) OVER (PARTITION BY source ORDER BY v) AS f1
        |          FROM grid),
        |  acum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS fa FROM allc),
        |  d AS (SELECT c.source,
        |          max(abs(CAST(c.f1 AS HUGEINT) * (n.nn - t.n1) - (a.fa - c.f1) * CAST(t.n1 AS HUGEINT))) AS dnum
        |        FROM cum c JOIN acum a ON a.v = c.v
        |        JOIN tot t ON t.source = c.source CROSS JOIN n
        |        GROUP BY c.source)
        |SELECT d.source, t.n1 AS n_docs,
        |  CAST(1000000::HUGEINT * d.dnum // (CAST(t.n1 AS HUGEINT) * (n.nn - t.n1)) AS BIGINT) AS ks_ppm
        |FROM d JOIN tot t ON t.source = d.source CROSS JOIN n
        |WHERE n.nn > t.n1""".stripMargin) { (s, d) =>
      val docs = T.documents(s, d).select("source", "n_chars")
      val cnt = docs.groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
      val tot = docs.groupBy("source").agg(count(lit(1)).cast("long").as("n1"))
      val nn = docs.agg(count(lit(1)).cast("long").as("nn"))
      val vals = docs.select(col("n_chars").as("v")).distinct()
      val grid = docs.select("source").distinct()
        .crossJoin(vals)
        .join(cnt, Seq("source", "v"), "left")
        .selectExpr("source", "v", "coalesce(c, 0L) as cs")
      val cum = grid.selectExpr("source", "v",
        "sum(cs) over (partition by source order by v) as f1")
      // corpus-wide CDF: the value domain is distinct doc LENGTHS —
      // bounded by the longest document, not by the plan — so the
      // running sum rides the distributed prefix sum (inclusive = c +
      // exclusive) instead of a single-partition `SUM() OVER (ORDER BY
      // v)`; frame read twice (sketch + prefix), caller clearCache
      // releases
      val acum = graft.operators.Ordinal.withGlobalPrefixSum(
        docs.groupBy(col("n_chars").as("v"))
          .agg(count(lit(1)).as("c")).persist(),
        "v", "c", "_fa_ex")
        .selectExpr("v", "_fa_ex + c as fa")
      cum.join(acum, "v")
        .join(broadcast(tot), "source")
        .crossJoin(broadcast(nn))
        .groupBy("source")
        // DECIMAL(38,0) arithmetic end-to-end: dnum reaches n1·(nn−n1)
        // and the ppm numerator multiplies it by 10^6 — BIGINT overflows
        // past a few million docs with a balanced split, exactly the
        // scale this query claims. DuckDB runs the same math in HUGEINT,
        // so the wide-decimal Spark side stays bit-identical (the an17
        // KMV estimator convention).
        .agg(max(expr("abs(cast(f1 as decimal(38,0)) * (nn - n1) " +
          "- (fa - f1) * cast(n1 as decimal(38,0)))")).as("dnum"))
        .join(broadcast(tot), "source")
        .crossJoin(broadcast(nn))
        // single-source corpus: there is no "rest" to drift from — drop
        // the row rather than divide by zero (engines disagree there)
        .filter(col("nn") > col("n1"))
        .selectExpr("source", "n1 as n_docs",
          "cast(cast(1000000 as decimal(38,0)) * dnum " +
            "div (cast(n1 as decimal(38,0)) * (nn - n1)) as bigint) as ks_ppm")
    },

    // Mergeable-sketch maintenance: KMV distinct-count state for the
    // BASE corpus (doc_id < 400) merged with a DELTA batch's state
    // (doc_id ≥ 400) must equal the from-scratch sketch — q_incr_merge's
    // MERGE-refresh move applied to a SKETCH instead of exact counts.
    // This is the property that makes cardinality tracking affordable
    // at 100 TB: each ingest keeps only k=32 longs per source, merge =
    // union → sort → keep-32, and the estimate NEVER needs the base
    // re-scanned. The merge is lossless by the KMV theorem (the k
    // smallest of a union are contained in the union of each side's k
    // smallest) — `matches_full` pins it row-by-row rather than
    // assuming it. Scale: both sides reduce to ≤ k rows per source
    // before the merge; the rank windows order k-row frames.
    Q(
      "an19_kmv_merge",
      s"""WITH tok AS (SELECT doc_id, source,
         |      unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |    FROM documents),
         |  t AS (SELECT DISTINCT doc_id, source, ${P.duckHash60("'kmv|' || w")} AS h FROM tok),
         |  base AS (SELECT source, h FROM (
         |      SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM (SELECT DISTINCT source, h FROM t WHERE doc_id < 400)) WHERE rn <= 32),
         |  delta AS (SELECT source, h FROM (
         |      SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM (SELECT DISTINCT source, h FROM t WHERE doc_id >= 400)) WHERE rn <= 32),
         |  m AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |        FROM (SELECT DISTINCT source, h FROM (
         |          SELECT * FROM base UNION ALL SELECT * FROM delta))),
         |  full_r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
         |          count(*) OVER (PARTITION BY source) AS nf
         |        FROM (SELECT DISTINCT source, h FROM t)),
         |  est_m AS (SELECT source, CAST(count(*) AS BIGINT) AS k_m,
         |          max(CASE WHEN rn = 32 THEN h END) AS kth
         |        FROM m WHERE rn <= 32 GROUP BY source),
         |  est_f AS (SELECT source, CAST(min(nf) AS BIGINT) AS n_exact,
         |          max(CASE WHEN rn = 32 THEN h END) AS kth
         |        FROM full_r GROUP BY source),
         |  e AS (SELECT em.source,
         |      CASE WHEN em.k_m < 32 THEN em.k_m
         |           ELSE CAST(35740566642812256256 // em.kth AS BIGINT) END AS est_merged,
         |      CASE WHEN ef.n_exact < 32 THEN ef.n_exact
         |           ELSE CAST(35740566642812256256 // ef.kth AS BIGINT) END AS est_full
         |    FROM est_m em JOIN est_f ef ON ef.source = em.source)
         |SELECT source, est_merged, est_full,
         |  est_merged = est_full AS matches_full
         |FROM e""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val bySrc = Window.partitionBy("source").orderBy("h")
      // md5 after the (doc_id, source, token) distinct — once per
      // distinct triple instead of once per occurrence (the an17/
      // q_approx_distinct r16 convention); outer distinct keeps exact
      // distinct-hash semantics under a 60-bit collision
      val t = T.documents(s, d)
        .selectExpr("doc_id", "source",
          "explode(split(lower(text), '\\\\s+')) as w")
        .distinct()
        .selectExpr("doc_id", "source", s"${P.hash60("concat('kmv|', w)")} as h")
        .distinct()
        .persist() // base + delta + full sketches share it; clearCache releases
      def sketch(df: org.apache.spark.sql.DataFrame) = df
        .select("source", "h").distinct()
        .withColumn("rn", row_number().over(bySrc))
        .filter(col("rn") <= 32)
        .select("source", "h")
      val merged = sketch(t.filter(col("doc_id") < 400))
        .unionAll(sketch(t.filter(col("doc_id") >= 400)))
        .distinct()
        .withColumn("rn", row_number().over(bySrc))
        .filter(col("rn") <= 32)
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("k_m"),
          max(when(col("rn") === 32, col("h"))).as("kth_m"))
      val full = t.select("source", "h").distinct()
        .withColumn("rn", row_number().over(bySrc))
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_exact"),
          max(when(col("rn") === 32, col("h"))).as("kth_f"))
      // wide-decimal single divide — see an17's overflow note
      def est(kCol: String, kthCol: String) =
        s"case when $kCol < 32 then $kCol " +
          s"else cast(cast('35740566642812256256' as decimal(38,0)) " +
          s"div $kthCol as bigint) end"
      merged.join(full, "source")
        .selectExpr("source",
          s"${est("k_m", "kth_m")} as est_merged",
          s"${est("n_exact", "kth_f")} as est_full")
        .selectExpr("source", "est_merged", "est_full",
          "est_merged = est_full as matches_full")
    },

    // Count-min-sketch frequency estimation, validated against exact
    // counts: a d=4 × w=512 counter grid over the token stream (bucket =
    // 60-bit portable hash of the salted token, mod w), estimate =
    // min over the 4 rows — the one-sided-error heavy-hitter sketch
    // (estimate ≥ truth always; `overcount` pins the bias per token).
    // KMV (an17/an19) answers "how many distinct"; CMS answers "how
    // often does each item occur" in O(d·w) memory — the other half of
    // the streaming-sketch pair a 100 TB token pipeline carries. Unlike
    // approx_count_distinct's engine-private HLL, every counter here is
    // md5-derived and bit-portable, so the gate hash-matches estimates,
    // not just bounds. Scale: counters are built FROM the vocab-bounded
    // exact-count frame (one corpus tokenize feeds counts, sketch, and
    // top-k — no second scan); the 4× row fan-out multiplies vocab rows,
    // not corpus tokens, and collapses map-side to ≤ d·w = 2048 cells;
    // the top-20 is TakeOrderedAndProject over the vocab frame; the cell
    // lookup is an 80-row × 2048-row broadcast join. At true stream
    // scale the same grid updates in-place per shard and merges by
    // cell-wise add (the CMS merge law) — this plan is the batch
    // validator for that estimator.
    Q(
      "an20_cms_frequency",
      s"""WITH tok AS (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |             FROM documents),
         |  c AS (SELECT w, count(*)::BIGINT AS n FROM tok GROUP BY w),
         |  rows_ AS (SELECT unnest([0,1,2,3]) AS r),
         |  cms AS (SELECT r, ${P.duckHash60("'cms' || r::VARCHAR || '|' || w")} % 512 AS b,
         |            SUM(n)::BIGINT AS cnt
         |          FROM c CROSS JOIN rows_ GROUP BY r, b),
         |  topk AS (SELECT w, n AS n_exact FROM c ORDER BY n DESC, w LIMIT 20)
         |SELECT t.w AS token, t.n_exact, min(m.cnt) AS n_est,
         |  min(m.cnt) - t.n_exact AS overcount
         |FROM topk t CROSS JOIN rows_ r
         |JOIN cms m ON m.r = r.r
         |  AND m.b = ${P.duckHash60("'cms' || r.r::VARCHAR || '|' || t.w")} % 512
         |GROUP BY t.w, t.n_exact""".stripMargin) { (s, d) =>
      val bucket = (rCol: String, wCol: String) =>
        s"${P.hash60(s"concat('cms', cast($rCol as string), '|', $wCol)")} % 512"
      val c = T.documents(s, d)
        .selectExpr("explode(split(lower(text), '\\\\s+')) as w")
        .groupBy("w").agg(count(lit(1)).cast("long").as("n"))
        .persist() // feeds sketch + top-k; caller clearCache releases
      val cms = c
        .selectExpr("w", "n", "explode(array(0, 1, 2, 3)) as r")
        .selectExpr("r", s"${bucket("r", "w")} as b", "n")
        .groupBy("r", "b").agg(sum("n").cast("long").as("cnt"))
      c.orderBy(col("n").desc, col("w")).limit(20)
        .selectExpr("w", "n as n_exact", "explode(array(0, 1, 2, 3)) as r")
        .selectExpr("w", "n_exact", "r", s"${bucket("r", "w")} as b")
        .join(broadcast(cms), Seq("r", "b"))
        .groupBy("w", "n_exact")
        .agg(min("cnt").as("n_est"))
        .selectExpr("w as token", "n_exact", "n_est",
          "n_est - n_exact as overcount")
    },

    // CMS merge law, GATED (the an19 move applied to count-min): the
    // d=4 × w=512 grid built per corpus shard (doc_id < 400 vs ≥ 400)
    // and merged CELL-WISE BY ADDITION must yield the same top-20
    // frequency estimates as the grid built from the full corpus in one
    // pass. an20 claimed this law in prose; this query pins it row-by-row
    // (`matches_full`), because the law — counters are linear in the
    // input, so sharded grids sum to the full grid — is exactly what a
    // user trusts when each of 1000 executors keeps a local grid and the
    // driver folds them. Scale: each shard's grid collapses map-side to
    // ≤ d·w = 2048 cells before any exchange; the merge is a 2·2048-row
    // groupBy; the top-20 probe is an 80-row broadcast join against each
    // grid. Nothing here ever shuffles the token stream itself.
    Q(
      "an21_cms_merge",
      s"""WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |             FROM documents),
         |  c AS (SELECT CASE WHEN doc_id < 400 THEN 0 ELSE 1 END AS shard, w,
         |          count(*)::BIGINT AS n
         |        FROM tok GROUP BY shard, w),
         |  rows_ AS (SELECT unnest([0,1,2,3]) AS r),
         |  sg AS (SELECT shard, r, ${P.duckHash60("'cms' || r::VARCHAR || '|' || w")} % 512 AS b,
         |           SUM(n)::BIGINT AS cnt
         |         FROM c CROSS JOIN rows_ GROUP BY shard, r, b),
         |  merged AS (SELECT r, b, SUM(cnt)::BIGINT AS cnt FROM sg GROUP BY r, b),
         |  fc AS (SELECT w, SUM(n)::BIGINT AS n FROM c GROUP BY w),
         |  fg AS (SELECT r, ${P.duckHash60("'cms' || r::VARCHAR || '|' || w")} % 512 AS b,
         |           SUM(n)::BIGINT AS cnt
         |         FROM fc CROSS JOIN rows_ GROUP BY r, b),
         |  topk AS (SELECT w FROM fc ORDER BY n DESC, w LIMIT 20),
         |  em AS (SELECT t.w, min(m.cnt) AS est_merged
         |         FROM topk t CROSS JOIN rows_ r
         |         JOIN merged m ON m.r = r.r
         |           AND m.b = ${P.duckHash60("'cms' || r.r::VARCHAR || '|' || t.w")} % 512
         |         GROUP BY t.w),
         |  ef AS (SELECT t.w, min(m.cnt) AS est_full
         |         FROM topk t CROSS JOIN rows_ r
         |         JOIN fg m ON m.r = r.r
         |           AND m.b = ${P.duckHash60("'cms' || r.r::VARCHAR || '|' || t.w")} % 512
         |         GROUP BY t.w)
         |SELECT em.w AS token, em.est_merged, ef.est_full,
         |  em.est_merged = ef.est_full AS matches_full
         |FROM em JOIN ef ON ef.w = em.w""".stripMargin) { (s, d) =>
      val bucket = (rCol: String, wCol: String) =>
        s"${P.hash60(s"concat('cms', cast($rCol as string), '|', $wCol)")} % 512"
      val c = T.documents(s, d)
        .selectExpr("case when doc_id < 400 then 0 else 1 end as shard",
          "explode(split(lower(text), '\\\\s+')) as w")
        .groupBy("shard", "w").agg(count(lit(1)).cast("long").as("n"))
        .persist() // feeds both shard grids + full counts; clearCache releases
      def grid(counts: org.apache.spark.sql.DataFrame) = counts
        .selectExpr("w", "n", "explode(array(0, 1, 2, 3)) as r")
        .selectExpr("r", s"${bucket("r", "w")} as b", "n")
        .groupBy("r", "b").agg(sum("n").cast("long").as("cnt"))
      // the merge under test: per-shard grids folded cell-wise by addition
      val merged = grid(c.filter(col("shard") === 0))
        .unionAll(grid(c.filter(col("shard") === 1)))
        .groupBy("r", "b").agg(sum("cnt").cast("long").as("cnt"))
      val fullCounts = c.groupBy("w").agg(sum("n").cast("long").as("n"))
      val fullGrid = grid(fullCounts)
      val topk = fullCounts.orderBy(col("n").desc, col("w")).limit(20).select("w")
      def estimate(g: org.apache.spark.sql.DataFrame, estName: String) = topk
        .selectExpr("w", "explode(array(0, 1, 2, 3)) as r")
        .selectExpr("w", "r", s"${bucket("r", "w")} as b")
        .join(broadcast(g), Seq("r", "b"))
        .groupBy("w").agg(min("cnt").as(estName))
      estimate(merged, "est_merged")
        .join(estimate(fullGrid, "est_full"), "w")
        .selectExpr("w as token", "est_merged", "est_full",
          "est_merged = est_full as matches_full")
    },

    // Mergeable QUANTILE sketch — the third leg of the sketch family
    // (an17/an19 KMV: how many distinct; an20/an21 CMS: how often each;
    // this: how DISTRIBUTED), the drift-monitoring workhorse a 100 TB
    // pipeline keeps per source. The sketch is the k=16 docs with the
    // SMALLEST 60-bit hash of their id — a hash-ordered k-min sample is
    // a uniform random sample of the source, mergeable by exactly the
    // KMV theorem an19 gates (the k hash-smallest of a union are
    // contained in the union of each side's k hash-smallest), and —
    // unlike approx_percentile's engine-private GK sketch — bit-portable,
    // so the gate hash-matches the ESTIMATES. Quantile q = the value at
    // rank ceil(q·k) of the sample sorted ascending (all-integer rank
    // arithmetic: (k+1) div 2, (9k+9) div 10 — no float percentile
    // machinery on either engine); sources with ≤ k docs degenerate to
    // the exact quantile by the same formula, and err_bp pins the
    // sampling error against the exact full-data quantile computed with
    // the SAME positional rule (so the column measures sampling error,
    // not formula disagreement). k=16 against the fixture's 25-doc
    // sources so the gate exercises REAL sampling (not just the
    // degenerate all-rows branch, which QuerySpec pins separately via
    // [[sampleQuantiles]] with k > source size). Scale: the (source,
    // doc) frame partial-aggregates map-side before the one exchange;
    // both rank windows order per-source frames (the an17 shape —
    // per-partition top-k + merge at extreme scale); everything after
    // the k-row samples is driver-trivial.
    Q(
      "an22_sample_quantiles",
      s"""WITH d AS (SELECT source, n_chars,
         |      ${P.duckHash60("'qs|' || CAST(doc_id AS VARCHAR)")} AS h
         |    FROM documents),
         |  r AS (SELECT source, n_chars,
         |          row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
         |          count(*) OVER (PARTITION BY source) AS nd
         |        FROM d),
         |  smp AS (SELECT source, n_chars, nd,
         |            CASE WHEN nd < 16 THEN nd ELSE 16 END AS k,
         |            row_number() OVER (PARTITION BY source ORDER BY n_chars, rn) AS vr
         |          FROM r WHERE rn <= 16),
         |  est AS (SELECT source, CAST(min(nd) AS BIGINT) AS n_docs,
         |            CAST(min(k) AS BIGINT) AS k,
         |            max(CASE WHEN vr = (k + 1) // 2 THEN n_chars END) AS est_p50,
         |            max(CASE WHEN vr = (9 * k + 9) // 10 THEN n_chars END) AS est_p90
         |          FROM smp GROUP BY source),
         |  fx AS (SELECT source, n_chars,
         |           row_number() OVER (PARTITION BY source ORDER BY n_chars, h) AS vr,
         |           count(*) OVER (PARTITION BY source) AS nd
         |         FROM d),
         |  ex AS (SELECT source,
         |           max(CASE WHEN vr = (nd + 1) // 2 THEN n_chars END) AS ex_p50,
         |           max(CASE WHEN vr = (9 * nd + 9) // 10 THEN n_chars END) AS ex_p90
         |         FROM fx GROUP BY source)
         |SELECT e.source, e.n_docs, e.k,
         |  CAST(e.est_p50 AS BIGINT) AS est_p50, CAST(x.ex_p50 AS BIGINT) AS ex_p50,
         |  CAST(e.est_p90 AS BIGINT) AS est_p90, CAST(x.ex_p90 AS BIGINT) AS ex_p90,
         |  (abs(e.est_p50 - x.ex_p50) * 10000) // greatest(1, x.ex_p50) AS err50_bp,
         |  (abs(e.est_p90 - x.ex_p90) * 10000) // greatest(1, x.ex_p90) AS err90_bp
         |FROM est e JOIN ex x ON x.source = e.source""".stripMargin) { (s, d) =>
      sampleQuantiles(T.documents(s, d), k = 16)
    },

    // Quantile-sketch MERGE LAW, gated — completing the triple: every
    // sketch family now carries estimator + gated merge (an17+an19 KMV,
    // an20+an21 CMS, an22+this). Per source, the k=16 hash-min sample of
    // the BASE corpus (doc_id < 400) unioned with the DELTA batch's
    // sample and re-cut to the k hash-smallest must yield the SAME p50/
    // p90 estimates as the sample built from all docs in one pass —
    // lossless by the KMV containment theorem (the k hash-smallest of a
    // union live inside the union of each side's k hash-smallest), which
    // is what lets 1000 executors each keep a k-row sample and the
    // driver fold them without ever reseeing the base. `matches_full`
    // pins it row-by-row. Scale: each side reduces to ≤ k (h, value)
    // rows per source before the merge; every window orders k-row or
    // per-source frames.
    Q(
      "an23_quantile_merge",
      s"""WITH d AS (SELECT doc_id, source, n_chars,
         |      ${P.duckHash60("'qs|' || CAST(doc_id AS VARCHAR)")} AS h
         |    FROM documents),
         |  base AS (SELECT source, n_chars, h FROM (
         |      SELECT source, n_chars, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM d WHERE doc_id < 400) WHERE rn <= 16),
         |  delta AS (SELECT source, n_chars, h FROM (
         |      SELECT source, n_chars, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM d WHERE doc_id >= 400) WHERE rn <= 16),
         |  m AS (SELECT source, n_chars, h,
         |          row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |        FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)),
         |  mk AS (SELECT source, n_chars,
         |           CASE WHEN min(cnt) OVER (PARTITION BY source) < 16
         |                THEN min(cnt) OVER (PARTITION BY source) ELSE 16 END AS k,
         |           row_number() OVER (PARTITION BY source ORDER BY n_chars, rn) AS vr
         |         FROM (SELECT source, n_chars, rn,
         |                 count(*) OVER (PARTITION BY source) AS cnt
         |               FROM m WHERE rn <= 16)),
         |  em AS (SELECT source,
         |           max(CASE WHEN vr = (k + 1) // 2 THEN n_chars END) AS m_p50,
         |           max(CASE WHEN vr = (9 * k + 9) // 10 THEN n_chars END) AS m_p90
         |         FROM mk GROUP BY source),
         |  f AS (SELECT source, n_chars, h,
         |          row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |        FROM d),
         |  fk AS (SELECT source, n_chars,
         |           CASE WHEN min(cnt) OVER (PARTITION BY source) < 16
         |                THEN min(cnt) OVER (PARTITION BY source) ELSE 16 END AS k,
         |           row_number() OVER (PARTITION BY source ORDER BY n_chars, rn) AS vr
         |         FROM (SELECT source, n_chars, rn,
         |                 count(*) OVER (PARTITION BY source) AS cnt
         |               FROM f WHERE rn <= 16)),
         |  ef AS (SELECT source,
         |           max(CASE WHEN vr = (k + 1) // 2 THEN n_chars END) AS f_p50,
         |           max(CASE WHEN vr = (9 * k + 9) // 10 THEN n_chars END) AS f_p90
         |         FROM fk GROUP BY source)
         |SELECT em.source,
         |  CAST(em.m_p50 AS BIGINT) AS merged_p50, CAST(ef.f_p50 AS BIGINT) AS full_p50,
         |  CAST(em.m_p90 AS BIGINT) AS merged_p90, CAST(ef.f_p90 AS BIGINT) AS full_p90,
         |  em.m_p50 = ef.f_p50 AND em.m_p90 = ef.f_p90 AS matches_full
         |FROM em JOIN ef ON ef.source = em.source""".stripMargin) { (s, d) =>
      val bySrcH = Window.partitionBy("source").orderBy("h")
      val dd = T.documents(s, d)
        .selectExpr("doc_id", "source", "n_chars",
          s"${P.hash60("concat('qs|', cast(doc_id as string))")} as h")
        .persist() // base + delta + full samples share it; clearCache releases
      def cut(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("rn", row_number().over(bySrcH))
        .filter(col("rn") <= 16)
        .select("source", "n_chars", "h")
      def estim(sample: org.apache.spark.sql.DataFrame, p50: String, p90: String) =
        sample
          .withColumn("rn", row_number().over(bySrcH))
          .filter(col("rn") <= 16)
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("source")))
          .withColumn("k", expr("case when cnt < 16 then cnt else 16 end"))
          .withColumn("vr", row_number().over(
            Window.partitionBy("source").orderBy("n_chars", "rn")))
          .groupBy("source")
          .agg(
            max(expr("case when vr = (k + 1) div 2 then n_chars end")).as(p50),
            max(expr("case when vr = (9 * k + 9) div 10 then n_chars end")).as(p90))
      // the merge under test: per-shard k-cuts unioned, re-cut to k
      val merged = estim(
        cut(dd.filter(col("doc_id") < 400))
          .unionAll(cut(dd.filter(col("doc_id") >= 400))),
        "m_p50", "m_p90")
      val full = estim(dd.select("source", "n_chars", "h"), "f_p50", "f_p90")
      merged.join(full, "source")
        .selectExpr("source",
          "cast(m_p50 as bigint) as merged_p50", "cast(f_p50 as bigint) as full_p50",
          "cast(m_p90 as bigint) as merged_p90", "cast(f_p90 as bigint) as full_p90",
          "m_p50 = f_p50 and m_p90 = f_p90 as matches_full")
    }
  )

  /** The an22 machinery as a callable: hash-ordered k-min uniform sample
    * per `source`, positional-rank quantile estimates vs the exact
    * full-data quantiles computed with the same rule. The gated query
    * calls THIS, so API and oracle can't diverge; QuerySpec pins the
    * degenerate branch (k ≥ group size ⇒ est ≡ exact) with a large k the
    * fixture's 25-doc sources can't reach.
    */
  private[graft] def sampleQuantiles(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val bySrcH = Window.partitionBy("source").orderBy("h")
    val dd = docs
      .selectExpr("source", "n_chars",
        s"${P.hash60("concat('qs|', cast(doc_id as string))")} as h")
      .persist() // feeds sample + exact sides; caller clearCache releases
    val est = dd
      .withColumn("rn", row_number().over(bySrcH))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("source")))
      .filter(col("rn") <= k)
      .withColumn("k", expr(s"case when nd < $k then nd else $k end"))
      .withColumn("vr", row_number().over(
        Window.partitionBy("source").orderBy("n_chars", "rn")))
      .groupBy("source")
      .agg(
        min("nd").cast("long").as("n_docs"),
        min("k").cast("long").as("k"),
        max(expr("case when vr = (k + 1) div 2 then n_chars end")).as("est_p50"),
        max(expr("case when vr = (9 * k + 9) div 10 then n_chars end")).as("est_p90"))
    val ex = dd
      .withColumn("vr", row_number().over(
        Window.partitionBy("source").orderBy("n_chars", "h")))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("source")))
      .groupBy("source")
      .agg(
        max(expr("case when vr = (nd + 1) div 2 then n_chars end")).as("ex_p50"),
        max(expr("case when vr = (9 * nd + 9) div 10 then n_chars end")).as("ex_p90"))
    est.join(ex, "source")
      .selectExpr("source", "n_docs", "k",
        "cast(est_p50 as bigint) as est_p50", "cast(ex_p50 as bigint) as ex_p50",
        "cast(est_p90 as bigint) as est_p90", "cast(ex_p90 as bigint) as ex_p90",
        "(abs(est_p50 - ex_p50) * 10000) div greatest(1, ex_p50) as err50_bp",
        "(abs(est_p90 - ex_p90) * 10000) div greatest(1, ex_p90) as err90_bp")
  }
}
