package graft.operators

import graft.{Portable => P, Q, Tables => T}
import org.apache.spark.sql.functions._

/** Headline analytical queries (TPC-H-shaped) over the test star schema.
  *
  * These exercise the whole relational engine surface at once — scan
  * pushdown, hash aggregation with partial (map-side) combine, broadcast
  * joins for the small dimensions, shuffle joins for fact-fact — and are
  * the primary BENCH workload. Dimension tables (region/nation/supplier/
  * customer/part) are broadcast explicitly: at 100 TB the fact tables grow
  * but dims stay broadcast-able, so these plans hold shape at scale.
  */
object HeadlineQueries {

  val queries: Seq[Q] = Seq(

    // Pricing summary (TPC-H Q1 shape): full-fact scan + 4-way agg.
    Q(
      "q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          expr(P.dsum("l_quantity")).as("sum_qty"),
          expr(P.dsum("l_extendedprice")).as("sum_base_price"),
          expr(P.dsum("l_extendedprice * (1 - l_discount)", 6)).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // Shipping-priority (Q3 shape): customer ⋈ orders ⋈ lineitem, top-10.
    Q(
      "q3_top_revenue_orders",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val c = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = T.orders(s, d).filter(col("o_orderstatus") === "O")
      val l = T.lineitem(s, d)
      // orders and customer both scale with the fact data — no broadcast
      // hints; AQE promotes the small side at runtime when it fits.
      l.join(o.join(c, col("c_custkey") === col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
          expr(P.dsum("l_extendedprice * (1 - l_discount)", 6)).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Local-supplier volume (Q5 shape): 6-way join through the dim chain.
    Q(
      "q5_nation_revenue",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n_name""".stripMargin) { (s, d) =>
      val l = T.lineitem(s, d)
      val o = T.orders(s, d)
      val c = T.customer(s, d)
      val su = T.supplier(s, d)
      val n = T.nation(s, d)
      val r = T.region(s, d).filter(col("r_name").isin("ASIA", "EUROPE"))
      // customer and supplier scale with the fact data — no broadcast
      // hint; AQE broadcasts while they fit and shuffles when they don't.
      // Only the genuinely fixed dims (nation, region) stay hinted.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(
          su,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(expr(P.dsum("l_extendedprice * (1 - l_discount)", 6)).as("revenue"))
    },

    // Forecasting revenue change (Q6 shape): pure scan + filter + scalar agg;
    // the filters must reach the parquet reader (PushedFilters).
    Q(
      "q6_forecast_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) {
      (s, d) =>
        T.lineitem(s, d)
          .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(
            expr(P.dsum("l_extendedprice * l_discount", 6)).as("revenue"),
            count(lit(1)).as("n"))
    },

    // Order-priority checking (Q4 shape): EXISTS via left-semi join.
    Q(
      "q4_priority_semijoin",
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderstatus = 'F' AND EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = T.orders(s, d).filter(col("o_orderstatus") === "F")
      val l = T.lineitem(s, d).filter(col("l_quantity") > 45)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
    },

    // Anti-join (orders with no high-quantity lines) — NOT EXISTS.
    Q(
      "q_antijoin_orders",
      """SELECT o_orderstatus, count(*) AS n
        |FROM orders
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 40)
        |GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      val l = T.lineitem(s, d).filter(col("l_quantity") > 40)
      T.orders(s, d)
        .join(l, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
    },

    // Distinct + exact distinct-count profiling over a fact column.
    Q(
      "q_distinct_profile",
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem""".stripMargin) { (s, d) =>
      T.lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
    },

    // Approximate distinct via a KMV (k-minimum-values) sketch: the
    // k=32 smallest 60-bit key hashes give the unbiased estimator
    // (k−1)·2⁶⁰/h₍ₖ₎ — the an17 machinery pointed at a fact column.
    // Formerly HLL (approx_count_distinct), which is rows-only gateable
    // because engines' HLL sketches differ; KMV rides the portable md5
    // hash, so the estimate itself hash-matches DuckDB bit-for-bit.
    // `exact_parts` counts distinct hashes (indistinguishable from
    // distinct keys short of a 60-bit collision — and both engines
    // would agree even then). Scale: the distinct-hash frame
    // partial-aggregates map-side; the k-smallest pass is per-partition
    // top-k merged on the driver (TakeOrdered), never a global sort;
    // the estimator numerator (k−1)·2⁶⁰ exceeds BIGINT so the divide
    // runs in DECIMAL(38,0)/HUGEINT (the an17 convention).
    Q(
      "q_approx_distinct",
      s"""WITH t AS (SELECT DISTINCT ${P.duckHash60("'kmv|' || CAST(l_partkey AS VARCHAR)")} AS h
         |           FROM lineitem),
         |  k AS (SELECT max(h) AS kth FROM (SELECT h FROM t ORDER BY h LIMIT 32)),
         |  n AS (SELECT CAST(count(*) AS BIGINT) AS n_hashes FROM t),
         |  r AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem)
         |SELECT CAST(32 AS BIGINT) AS k,
         |  CASE WHEN n_hashes < 32 THEN n_hashes
         |       ELSE CAST(35740566642812256256 // kth AS BIGINT) END AS approx_parts,
         |  n_hashes AS exact_parts, n_rows
         |FROM k CROSS JOIN n CROSS JOIN r""".stripMargin) { (s, d) =>
      // persisted: the kth-min and count branches don't canonicalize to
      // one exchange (verified in PLANS.md — no ReusedExchange), so an
      // unpersisted frame would scan + distinct the fact TWICE; caller
      // clearCache releases (the r1Bands convention).
      // Hash AFTER the key-level distinct (VERDICT r15 #6): md5 is the
      // dominant per-row cost, and hashing the fact column directly
      // paid it once per ROW (600k at sf0.1) instead of once per
      // DISTINCT KEY (~20k) — the first distinct partial-aggregates
      // longs map-side, then ~3% of the md5 work reproduces the same
      // hash set (the outer distinct keeps the oracle's exact
      // distinct-hash semantics under a 60-bit collision).
      val t = T.lineitem(s, d)
        .select("l_partkey").distinct()
        .selectExpr(s"${P.hash60("concat('kmv|', cast(l_partkey as string))")} as h")
        .distinct()
        .persist()
      val k32 = t.orderBy("h").limit(32).agg(max("h").as("kth"))
      val nh = t.agg(count(lit(1)).cast("long").as("n_hashes"))
      val nr = T.lineitem(s, d).agg(count(lit(1)).cast("long").as("n_rows"))
      k32.crossJoin(broadcast(nh)).crossJoin(broadcast(nr))
        .selectExpr("cast(32 as bigint) as k",
          "case when n_hashes < 32 then n_hashes " +
            "else cast(cast('35740566642812256256' as decimal(38,0)) " +
            "div kth as bigint) end as approx_parts",
          "n_hashes as exact_parts", "n_rows")
    },

    // Window function: top-3 highest-price lines per order (partitioned
    // window → parallel; ties broken by linenumber+quantity for a total
    // order over the non-unique synthetic keys).
    Q(
      "q_window_topn",
      """SELECT l_orderkey, CAST(rn AS BIGINT) AS rn, l_extendedprice
        |FROM (
        |  SELECT l_orderkey, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber, l_quantity) AS rn
        |  FROM lineitem WHERE l_orderkey % 10 = 3)
        |WHERE rn <= 3""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"), col("l_quantity"))
      T.lineitem(s, d)
        .filter(col("l_orderkey") % 10 === 3)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("l_orderkey", "rn", "l_extendedprice")
    },

    // Returned-item reporting (Q10 shape): customers ranked by revenue
    // lost to returns — fact-fact shuffle join + dim lookup + top-k.
    Q(
      "q10_returned_customers",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      T.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(expr(P.dsum("l_extendedprice * (1 - l_discount)", 6)).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // As-of join: attach to every click the most recent prior 'view' of
    // the same user. Composed from built-ins (union + partitioned window
    // last_value over preceding rows) — no custom operator needed, stays
    // parallel per user key. The standard event-attribution shape.
    Q(
      "q_asof_join",
      """WITH tagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN event_type = 'view' THEN event_id END AS view_id
        |  FROM events WHERE event_type IN ('view', 'click')),
        |  attributed AS (
        |  SELECT user_id, event_id, event_type,
        |    max(view_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_view
        |  FROM tagged)
        |SELECT user_id, event_id, COALESCE(asof_view, -1) AS asof_view
        |FROM attributed WHERE event_type = 'click'""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = T.events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .withColumn("view_id", when(col("event_type") === "view", col("event_id")))
      // event_id increases with ts in the fixture, so max(view_id) over the
      // preceding frame IS the latest prior view — one window, no join.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("asof_view", max("view_id").over(w))
        .filter(col("event_type") === "click")
        .selectExpr("user_id", "event_id", "coalesce(asof_view, -1) as asof_view")
    },

    // Bloom pre-filtered fact-dim join: the small side (urgent orders,
    // every 50th key) builds a native Bloom filter; lineitem rows failing
    // `might_contain` are dropped BEFORE the join shuffle. False positives
    // are removed by the join itself, so the result is exactly the plain
    // join — which is what the oracle checks.
    Q(
      "q_bloom_prefilter",
      """SELECT l.l_orderkey, o.o_orderpriority,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS rev
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderkey % 50 = 0
        |GROUP BY l.l_orderkey, o.o_orderpriority""".stripMargin) { (s, d) =>
      val small = T.orders(s, d)
        .filter("o_orderpriority = '1-URGENT' and o_orderkey % 50 = 0")
        .selectExpr("o_orderkey as l_orderkey", "o_orderpriority")
      val big = T.lineitem(s, d).select("l_orderkey", "l_extendedprice")
      graft.plans.BloomPrefilter.join(big, small, "l_orderkey")
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(expr(P.dsum("l_extendedprice")).as("rev"))
    },

    // Rollup aggregation (hierarchical subtotals; NULL grouping semantics
    // are identical across engines).
    Q(
      "q_rollup_totals",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) {
      (s, d) =>
        T.lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), expr(P.dsum("l_quantity")).as("qty"))
    },

    // Salted fact-fact join: lineitem×orders with the join key salted into
    // 8 buckets (left rows hashed, right rows replicated 8×) — the
    // deterministic hot-key defense when a handful of keys dominate and
    // AQE's runtime skew split isn't available (e.g. a pre-AQE shuffle or
    // an external sink partitioning). Salting changes ONLY the shuffle
    // distribution; the oracle checks the result equals the plain join.
    Q(
      "q_salted_join",
      """SELECT o.o_orderpriority AS priority, count(*) AS n,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS total
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin) { (s, d) =>
      val li = T.lineitem(s, d).select("l_orderkey", "l_extendedprice")
      val ord = T.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.plans.SkewTools.saltedJoin(li, ord, "l_orderkey", saltBuckets = 8)
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"), expr(P.dsum("l_extendedprice")).as("total"))
    },

    // Partitioned sink → pruned source round-trip: write orders
    // Hive-partitioned by priority, read back filtering two partitions —
    // the scan opens only those directories (PartitionFilters; the coarse
    // pruning lever that reads 0.1 % of a 1000-partition table before any
    // row-group stats are consulted). Oracle runs the same filter over the
    // original table, so the gate proves the round-trip is lossless.
    Q(
      "q_partition_prune",
      """SELECT o_orderpriority AS priority, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val path = Scratch.dir("graft-part-orders")
      graft.sources.Sources.writePartitioned(T.orders(s, d), path, "o_orderpriority")
      graft.sources.Sources.readPartitioned(s, path)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"), expr(P.dsum("o_totalprice")).as("total"))
    },

    // CSV sink → source round-trip (the interchange format everything
    // still speaks): events written with RFC 4180 quoting (escape = '"'
    // so the embedded JSON quotes double instead of backslash-escaping)
    // and read back under the EXPLICIT schema (inference is a second
    // scan and a determinism hazard), then aggregated. The oracle runs
    // the same aggregate over the original parquet, so the gate proves
    // the text round-trip is lossless — including doubles, whose
    // shortest-repr printing is read back bit-identical, and the
    // quoted JSON props column. Scale: CSV carries no column pruning or
    // predicate pushdown (note the contrast with op01's parquet scan) —
    // it's the ingest/egress edge format, converted to parquet at the
    // boundary; this query pins the conversion is faithful.
    Q(
      "q_csv_roundtrip",
      s"""SELECT event_type, count(*) AS n,
         |  ${P.duckDsum("value")} AS v,
         |  CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
         |  CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
         |  CAST(SUM(length(props)) AS BIGINT) AS props_chars
         |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).selectExpr("event_id", "user_id", "event_type",
        "value", "unix_micros(ts) as ts_us", "props")
      val path = Scratch.dir("graft-csv-events")
      // whitespace trimming is ON by default on the write side — a
      // props value with an edge space would silently shrink; disable
      // both sides. multiLine on read keeps quoted embedded newlines
      // one record (costs per-file parallelism — acceptable for an
      // edge format converted once at the boundary).
      ev.write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
      s.read.option("header", "true").option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("multiLine", "true")
        .schema(ev.schema).csv(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), expr(P.dsum("value")).as("v"),
          min("ts_us").cast("long").as("first_us"),
          max("ts_us").cast("long").as("last_us"),
          sum(length(col("props"))).cast("long").as("props_chars"))
    },

    // JSONL sink → source round-trip (the crawl/interchange format LLM
    // corpora actually arrive in): events written as one JSON object per
    // line, read back under an explicit schema, aggregated, and gated
    // against the same direct-parquet oracle as q_csv_roundtrip — so the
    // gate pins that doubles survive shortest-repr printing, that the
    // embedded-JSON `props` string nests losslessly (Jackson escapes the
    // inner quotes; no CSV-style quoting rules to configure), and that
    // timestamps carried as int64 micros dodge format/timezone drift
    // entirely. Scale: JSONL splits by line so reads parallelize per
    // block (unlike multiLine CSV), but carries no pruning or pushdown —
    // like CSV it is the boundary format, converted to parquet once at
    // ingest; this query pins that conversion is faithful.
    Q(
      "q_jsonl_roundtrip",
      s"""SELECT event_type, count(*) AS n,
         |  ${P.duckDsum("value")} AS v,
         |  CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
         |  CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
         |  CAST(SUM(length(props)) AS BIGINT) AS props_chars
         |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).selectExpr("event_id", "user_id", "event_type",
        "value", "unix_micros(ts) as ts_us", "props")
      val path = Scratch.dir("graft-jsonl-events")
      ev.write.mode("overwrite").json(path)
      s.read.schema(ev.schema).json(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), expr(P.dsum("value")).as("v"),
          min("ts_us").cast("long").as("first_us"),
          max("ts_us").cast("long").as("last_us"),
          sum(length(col("props"))).cast("long").as("props_chars"))
    },

    // ORC sink → source round-trip — the OTHER mainstream columnar
    // format (Hive-lineage warehouses hand data over as ORC the way
    // crawls hand over JSONL): events written with Spark's native ORC
    // writer, read back, aggregated, and gated against the same
    // direct-parquet oracle as the CSV/JSONL round-trips, so the gate
    // pins that doubles/longs/strings survive the binary round-trip
    // bit-exactly. Unlike those text formats, ORC is a real columnar
    // peer: it carries column pruning and predicate pushdown (min/max
    // stripe stats), so at scale it's an acceptable LANDING format, not
    // just an edge format — the conversion-at-the-boundary rule the CSV
    // comment states applies to text, not to this. Timestamps still
    // ride as int64 micros: ORC's own timestamp encoding is
    // writer-timezone-entangled, and the sibling queries' convention
    // (ints dodge format drift entirely) is the portable choice.
    Q(
      "q_orc_roundtrip",
      s"""SELECT event_type, count(*) AS n,
         |  ${P.duckDsum("value")} AS v,
         |  CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
         |  CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
         |  CAST(SUM(length(props)) AS BIGINT) AS props_chars
         |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).selectExpr("event_id", "user_id", "event_type",
        "value", "unix_micros(ts) as ts_us", "props")
      val path = Scratch.dir("graft-orc-events")
      ev.write.mode("overwrite").orc(path)
      s.read.schema(ev.schema).orc(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), expr(P.dsum("value")).as("v"),
          min("ts_us").cast("long").as("first_us"),
          max("ts_us").cast("long").as("last_us"),
          sum(length(col("props"))).cast("long").as("props_chars"))
    },

    // TFRecord sink → source round-trip — the REFERENCE'S own on-disk
    // format (TFRecordDataset; imagenet_input.py:168-170), read and
    // written natively (length-prefixed masked-CRC32C framing,
    // graft.sources.TfRecords) so a reference user's existing corpora
    // load directly instead of converting to parquet first. Documents
    // ride as one record each (fixed-width decimal doc_id + '|' + utf8
    // text — TFRecord payloads are opaque bytes; both CRCs verified on
    // read), then aggregate ≡ the original table per the q_csv_roundtrip
    // convention. Scale: shards are the read-parallelism unit — the
    // repartition(8) writes 8 shards so the read genuinely fans out;
    // records stream sequentially within a shard, exactly
    // TFRecordDataset's contract.
    Q(
      "q_tfrecord_roundtrip",
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(length(text)) AS BIGINT) AS chars,
        |  CAST(min(doc_id) AS BIGINT) AS first_id,
        |  CAST(max(doc_id) AS BIGINT) AS last_id
        |FROM documents""".stripMargin) { (s, d) =>
      val path = Scratch.dir("graft-tfrec-docs")
      graft.sources.TfRecords.write(
        T.documents(s, d).repartition(8).selectExpr(
          "cast(concat(lpad(cast(doc_id as string), 19, '0'), '|', text) as binary) as rec"),
        "rec", path)
      graft.sources.TfRecords.read(s, path)
        .selectExpr(
          "cast(substring(cast(record as string), 1, 19) as bigint) as doc_id",
          "substring(cast(record as string), 21) as text")
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum("doc_id").cast("long").as("id_sum"),
          sum(length(col("text"))).cast("long").as("chars"),
          min("doc_id").cast("long").as("first_id"),
          max("doc_id").cast("long").as("last_id"))
    },

    // CUBE aggregation with GROUPING() disambiguation (rollup's sibling;
    // grouping flags distinguish "NULL value" from "subtotal row").
    Q(
      "q_cube_totals",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) {
      (s, d) =>
        T.lineitem(s, d)
          .cube("l_returnflag", "l_linestatus")
          .agg(
            grouping(col("l_returnflag")).cast("long").as("g_rf"),
            grouping(col("l_linestatus")).cast("long").as("g_ls"),
            count(lit(1)).as("n"),
            expr(P.dsum("l_quantity")).as("qty"))
    },

    // Pivot: documents per (source, lang) spread into one column per
    // language — Spark's native pivot with an explicit value list (no
    // extra distinct-scan job); zero-filled so empty cells match the
    // oracle's conditional counts.
    Q(
      "q_pivot_counts", {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val cells = langs
          .map(l => s"count(CASE WHEN lang = '$l' THEN 1 END) AS $l")
          .mkString(", ")
        s"SELECT source, $cells FROM documents GROUP BY source"
      }) { (s, d) =>
      T.documents(s, d)
        .groupBy("source")
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    // Cumulative window frame (ROWS UNBOUNDED PRECEDING): running spend
    // per customer over their order history. The frame's accumulation
    // order is pinned by the unique (date, key) sort, and the decimal
    // running sum keeps every prefix exact — so all 150k prefreshes
    // hash-match. Window shards by customer; no global sort.
    Q(
      "q_running_total",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders""".stripMargin) { (s, d) =>
      T.orders(s, d)
        .selectExpr(
          "o_custkey", "o_orderkey",
          "cast(sum(cast(o_totalprice as decimal(28,4))) over (" +
            "partition by o_custkey order by o_orderdate, o_orderkey " +
            "rows between unbounded preceding and current row) as double) " +
            "as running_total")
    },

    // Set operators with SQL DISTINCT semantics: customers who ordered
    // urgently AND with low priority (INTERSECT), and urgent-only
    // customers (EXCEPT). Both compile to aggregate + join plans that
    // shuffle only the key column.
    Q(
      "q_setops",
      """SELECT o_custkey, 'both' AS kind FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        |UNION ALL
        |SELECT o_custkey, 'urgent_only' AS kind FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')""".stripMargin) {
      (s, d) =>
        val o = T.orders(s, d)
        val urgent = o.filter("o_orderpriority = '1-URGENT'").select("o_custkey")
        val low = o.filter("o_orderpriority = '5-LOW'").select("o_custkey")
        urgent.intersect(low).withColumn("kind", lit("both"))
          .unionAll(urgent.except(low).withColumn("kind", lit("urgent_only")))
    },

    // Explicit GROUPING SETS (arbitrary subtotal shapes beyond
    // rollup/cube), via the spark.sql entry point — the same Catalyst
    // Expand + single-shuffle aggregate the DataFrame rollup compiles to.
    Q(
      "q_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) {
      (s, d) =>
        T.lineitem(s, d).createOrReplaceTempView("graft_li_gs")
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
            |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
            |  count(*) AS n
            |FROM graft_li_gs
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    },

    // The same GROUPING SETS through the native Dataset API
    // (Dataset.groupingSets, new in Spark 4) — compiles to the identical
    // Expand + single-shuffle aggregate as the SQL entry point above;
    // gated separately so the native-API surface is covered too.
    Q(
      "q_grouping_sets_ds",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) {
      (s, d) =>
        T.lineitem(s, d)
          .groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
            col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping("l_returnflag").cast("bigint").as("g_rf"),
            grouping("l_linestatus").cast("bigint").as("g_ls"),
            count(lit(1)).as("n"))
    },

    // Bucketed co-located join: both sides written as 8-bucket tables on
    // the join key, then joined via the catalog — Spark matches the
    // bucket specs and plans the join with NO Exchange on either side
    // (PlanQualitySpec asserts it). THE pre-partitioning lever for a
    // repeatedly-joined 100 TB fact table: pay the bucketed write once,
    // skip the join shuffle on every subsequent query. The oracle runs
    // the plain join over the original parquet, so the gate also proves
    // the bucketed round-trip is lossless.
    Q(
      "q_bucket_join",
      """SELECT c.c_mktsegment AS segment, count(*) AS n,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_mktsegment""".stripMargin) { (s, d) =>
      // Per-invocation scratch dir (no shared-tmp overwrite race between
      // concurrent processes, no abs(Int.MinValue) hazard); catalog table
      // names are derived from the same unique dir so they can't collide
      // across sessions sharing a metastore, yet stay stable within one
      // JVM so bench reps overwrite in place.
      val base = Scratch.dir("graft_bucket_")
      val tag = java.lang.Long.toHexString(
        base.foldLeft(1125899906842597L)((h, c) => 31 * h + c))
      val ordersTbl = s"graft_bkt_orders_$tag"
      val custTbl = s"graft_bkt_cust_$tag"
      // A persistent metastore would otherwise accumulate one
      // graft_bkt_* pair per JVM whose backing files the Scratch hook
      // deletes — drop the catalog entries in the same shutdown pass
      // (best-effort: the session may already be stopped) (ADVICE r9).
      Scratch.once(s"drop_bkt_$tag") {
        s.sql(s"DROP TABLE IF EXISTS $ordersTbl")
        s.sql(s"DROP TABLE IF EXISTS $custTbl"): Unit
      }
      T.orders(s, d).select(col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").format("parquet")
        .option("path", s"$base/orders")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ordersTbl)
      T.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        .write.mode("overwrite").format("parquet")
        .option("path", s"$base/customer")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(custTbl)
      s.table(ordersTbl).join(s.table(custTbl), "o_custkey")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"), expr(P.dsum("o_totalprice")).as("total"))
    },

    // Slowly-changing-dimension type-2 history build: collapse each
    // user's event stream into effective-dated attribute versions — a
    // new version opens only when `event_type` CHANGES (lag-compare),
    // closes at the next change (lead), the last version stays open
    // (eff_to_us NULL, is_current). The warehouse-side MERGE pattern
    // rendered as two windows over one user_id exchange; timestamps stay
    // exact microsecond integers on both engines.
    //
    // Scale notes (100 TB): ONE exchange on user_id feeds both the
    // change-detection lag and the close-off lead (same window frame);
    // version rows (the output) are bounded by the number of attribute
    // changes, not events.
    Q(
      "q_scd2_history",
      """WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |             lag(event_type) OVER w AS prev_type
        |           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |     c AS (SELECT user_id, event_type, ts_us,
        |             row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS version
        |           FROM o WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type, CAST(version AS BIGINT) AS version,
        |  ts_us AS eff_from_us,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY version) AS eff_to_us,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current
        |FROM c""".stripMargin) { (s, d) =>
      T.events(s, d)
        .selectExpr("user_id", "event_type", "unix_micros(ts) as ts_us", "event_id")
        .selectExpr("*",
          "lag(event_type) over (partition by user_id order by ts_us, event_id) as prev_type")
        .filter("prev_type is null or prev_type <> event_type")
        .selectExpr("user_id", "event_type", "ts_us",
          "cast(row_number() over (partition by user_id order by ts_us, event_id) as bigint) as version")
        .selectExpr("user_id", "event_type", "version",
          "ts_us as eff_from_us",
          "lead(ts_us) over (partition by user_id order by version) as eff_to_us",
          "lead(ts_us) over (partition by user_id order by version) is null as is_current")
    },

    // Z-ORDER data layout (the Delta/Iceberg OPTIMIZE ZORDER BY move,
    // measured): bucket orders into a 256×256 (custkey, totalprice)
    // grid, interleave the bucket bits into a 16-bit Z-value, and cut
    // the Z-order into 32 equal files; the LINEAR arm cuts the same
    // rows into 32 files by custkey order alone. Per (layout, file):
    // row count and the file's span in each dimension — the min/max
    // stats a format's file-skipping consults. Z-order bounds BOTH
    // dims (measured at sf0.01: mean spans ~53×82 of 256 — row-count
    // cuts across a non-uniform grid, not perfect squares), so a
    // predicate on EITHER column skips most files; linear pins x only
    // and spans the FULL price range (mean span_y ~255 — price
    // predicates prune nothing). The gate pins exactly that contrast.
    // All-integer arithmetic: prices quantize to ×1e4 BIGINT before
    // bucketing, bit extraction is div/mod — engines agree bit-for-bit.
    //
    // Scale notes (100 TB): grid extrema are map-side-combined scalar
    // aggs broadcast back; Z-value assignment is a scan-local
    // projection (at scale the file cut is range-partitioning on zval
    // — the same exchange any sorted write pays); the per-file stats
    // rollup partial-aggregates to 64 rows.
    Q(
      "q_zorder_layout",
      s"""WITH o AS (SELECT o_custkey AS ck,
         |        CAST(CAST(o_totalprice AS DECIMAL(28,4)) * 10000 AS BIGINT) AS p_x4,
         |        row_number() OVER (ORDER BY o_orderkey) AS rn,
         |        count(*) OVER () AS n FROM orders),
         |  m AS (SELECT max(ck) AS max_ck, min(p_x4) AS min_p, max(p_x4) AS max_p FROM o),
         |  b AS (SELECT rn, n,
         |          (ck * 256) // ((SELECT max_ck FROM m) + 1) AS bx,
         |          ((p_x4 - (SELECT min_p FROM m)) * 256)
         |            // ((SELECT max_p FROM m) - (SELECT min_p FROM m) + 1) AS by
         |        FROM o),
         |  z AS (SELECT bx, by, $duckZ16 AS zval,
         |          row_number() OVER (ORDER BY $duckZ16, bx, by, rn) AS zrn, n
         |        FROM b),
         |  f AS (SELECT 'zorder' AS layout, ((zrn - 1) * 32) // n AS file_id, bx, by FROM z
         |        UNION ALL
         |        SELECT 'linear', ((zrn2 - 1) * 32) // n, bx, by FROM (
         |          SELECT bx, by, n, row_number() OVER (ORDER BY bx, by, rn) AS zrn2 FROM b))
         |SELECT layout, CAST(file_id AS BIGINT) AS file_id,
         |  count(*)::BIGINT AS n_rows,
         |  CAST(max(bx) - min(bx) AS BIGINT) AS span_x,
         |  CAST(max(by) - min(by) AS BIGINT) AS span_y
         |FROM f GROUP BY layout, file_id""".stripMargin) { (s, d) =>
      val o = T.orders(s, d).selectExpr("o_custkey as ck",
        "cast(cast(o_totalprice as decimal(28,4)) * 10000 as bigint) as p_x4",
        "row_number() over (order by o_orderkey) as rn",
        "count(1) over () as n")
      val m = o.agg(max("ck").as("max_ck"), min("p_x4").as("min_p"),
        max("p_x4").as("max_p"))
      val b = o.crossJoin(broadcast(m))
        .selectExpr("rn", "n",
          "(ck * 256) div (max_ck + 1) as bx",
          "((p_x4 - min_p) * 256) div (max_p - min_p + 1) as by")
      val z = b.selectExpr("bx", "by", "n",
        s"row_number() over (order by $sparkZ16, bx, by, rn) as zrn")
        .selectExpr("'zorder' as layout", "((zrn - 1) * 32) div n as file_id",
          "bx", "by")
      val lin = b.selectExpr("bx", "by", "n",
        "row_number() over (order by bx, by, rn) as zrn2")
        .selectExpr("'linear' as layout", "((zrn2 - 1) * 32) div n as file_id",
          "bx", "by")
      z.unionAll(lin)
        .groupBy("layout", "file_id")
        .agg(
          count(lit(1)).cast("long").as("n_rows"),
          (max("bx") - min("bx")).cast("long").as("span_x"),
          (max("by") - min("by")).cast("long").as("span_y"))
        .selectExpr("layout", "cast(file_id as bigint) as file_id",
          "n_rows", "span_x", "span_y")
    },

    incrMergeQ,

    // CDC latest-wins compaction (the lakehouse MERGE-upsert read
    // path): treat events as a changelog keyed by (user_id, event_type)
    // and keep each key's LATEST record by event time (event_id breaks
    // ts ties — a total order, so replays compact identically). The
    // dual of st05's first-touch; with q_scd2 (full history) and
    // q_incr_merge (agg maintenance) it completes the incremental-
    // pipeline trio. Scale: one key-partitioned rank window over
    // (key, ts, id) longs — the same exchange the upsert write itself
    // pays; values ride along, never shuffle twice.
    Q(
      "q_cdc_compact",
      """WITH o AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
        |        row_number() OVER (PARTITION BY user_id, event_type
        |          ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |      FROM events)
        |SELECT user_id, event_type, event_id AS last_event_id,
        |  ts_us AS last_ts_us, value AS last_value
        |FROM o WHERE rn = 1""".stripMargin) { (s, d) =>
      T.events(s, d)
        .selectExpr("user_id", "event_type", "event_id",
          "unix_micros(ts) as ts_us", "value")
        .selectExpr("*",
          "row_number() over (partition by user_id, event_type " +
            "order by ts_us desc, event_id desc) as rn")
        .filter(col("rn") === 1)
        .selectExpr("user_id", "event_type", "event_id as last_event_id",
          "ts_us as last_ts_us", "value as last_value")
    },

    // Small-file compaction planner (the lakehouse OPTIMIZE step): from
    // per-file size metadata, assign files to target-sized output bins
    // by sorted sequential packing — files ordered largest-first, a file
    // opens a new bin whenever the running total crosses the 1 MiB
    // target (bin = floor(cumulative-before / target)). The plan is a
    // METADATA-ONLY query: at 100 TB it reads the table's file manifest
    // (here derived: lineitem rows bucketed into 997 pseudo-files with
    // an integer size model), never the data, and emits the rewrite
    // job list. Largest-first keeps every bin within one file of
    // target, the classic sorted first-fit bound. Scale: one rollup to
    // the manifest's cardinality — which is MILLIONS of files at 100 TB,
    // so the running total rides Ordinal.withGlobalPrefixSum (quantile-
    // bucketed partial sums + broadcast bucket offsets) instead of a
    // single-partition `SUM() OVER (ORDER BY ...)` — the r12-verdict
    // window-funnel class, fixed here alongside sm13/an11.
    Q(
      "q_file_compaction",
      """WITH f AS (SELECT l_orderkey % 997 AS file_id,
        |    (count(*) * 64 + SUM(CAST(l_quantity AS BIGINT)))::BIGINT AS bytes
        |  FROM lineitem GROUP BY file_id),
        |  o AS (SELECT file_id, bytes,
        |          CAST(coalesce(SUM(bytes) OVER (ORDER BY bytes DESC, file_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |        FROM f),
        |  b AS (SELECT file_id, bytes, CAST(cum_before // 1048576 AS BIGINT) AS bin_id FROM o)
        |SELECT bin_id, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(SUM(bytes) AS BIGINT) AS bytes,
        |  CAST((1000000 * SUM(bytes)) // 1048576 AS BIGINT) AS fill_ppm
        |FROM b GROUP BY bin_id""".stripMargin) { (s, d) =>
      Ordinal.withGlobalPrefixSum(
        T.lineitem(s, d)
          .selectExpr("l_orderkey % 997 as file_id",
            "cast(l_quantity as bigint) as q")
          .groupBy("file_id")
          .agg((count(lit(1)) * 64 + sum("q")).cast("long").as("bytes"))
          // manifest frame read twice (quantile sketch + prefix); caller
          // clearCache releases
          .persist()
          // bytes DESC ≡ -bytes ASC: Ordinal buckets/orders ascending only
          .withColumn("_negbytes", -col("bytes")),
        "_negbytes", "bytes", "cum_before", tieCols = Seq("file_id"))
        .selectExpr("file_id", "bytes", "cum_before div 1048576 as bin_id")
        .groupBy("bin_id")
        .agg(
          count(lit(1)).cast("long").as("n_files"),
          sum("bytes").cast("long").as("bytes"))
        .selectExpr("bin_id", "n_files", "bytes",
          "cast((1000000 * bytes) div 1048576 as bigint) as fill_ppm")
    },

    // Merge-on-read delete vectors (the Iceberg/Delta deletion-vector
    // read path): the live view of a table = base files ⟕ delete
    // entries, with a per-file maintenance audit — live/deleted counts,
    // live_ppm, and the needs_rewrite verdict (deleted share > 10%)
    // that drives purge compaction, completing the lakehouse-
    // maintenance family (q_file_compaction sizes, q_zorder_layout
    // orders, q_cdc_compact upserts, THIS reclaims). Deletes are a
    // deterministic 15%-ish hash sample of keys standing in for the
    // accumulated DELETE commits. Scale: the delete table joins the
    // base on its key (broadcast while vectors are small, keyed
    // equi-join after — never a scan-side rewrite), and the audit
    // rolls up map-side to manifest cardinality; rewriting only files
    // past the threshold is the point — the read path pays one join,
    // the write path touches 10%-dead files only.
    Q(
      "q_mor_deletes",
      s"""WITH del AS (SELECT o_orderkey AS d_key FROM orders
         |             WHERE ${P.duckHash60("'del|' || o_orderkey::VARCHAR")} % 20 < 3),
         |  f AS (SELECT o.o_orderkey % 499 AS file_id,
         |          CASE WHEN d.d_key IS NOT NULL THEN 1 ELSE 0 END AS is_del
         |        FROM orders o LEFT JOIN del d ON d.d_key = o.o_orderkey)
         |SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(is_del) AS BIGINT) AS n_deleted,
         |  CAST(count(*) - SUM(is_del) AS BIGINT) AS n_live,
         |  CAST((1000000 * (count(*) - SUM(is_del))) // count(*) AS BIGINT) AS live_ppm,
         |  (1000000 * SUM(is_del)) // count(*) > 100000 AS needs_rewrite
         |FROM f GROUP BY file_id""".stripMargin) { (s, d) =>
      val o = T.orders(s, d).select("o_orderkey")
      val del = o
        .filter(expr(
          s"${P.hash60("concat('del|', cast(o_orderkey as string))")} % 20 < 3"))
        .select(col("o_orderkey").as("d_key"))
      o.join(broadcast(del), col("o_orderkey") === col("d_key"), "left")
        .selectExpr("o_orderkey % 499 as file_id",
          "case when d_key is not null then 1 else 0 end as is_del")
        .groupBy("file_id")
        .agg(
          count(lit(1)).cast("long").as("n_rows"),
          sum("is_del").cast("long").as("n_deleted"))
        .selectExpr("file_id", "n_rows", "n_deleted",
          "n_rows - n_deleted as n_live",
          "(1000000 * (n_rows - n_deleted)) div n_rows as live_ppm",
          "(1000000 * n_deleted) div n_rows > 100000 as needs_rewrite")
    }
  )

  /** Incremental aggregate maintenance (the MERGE-refresh move every
    * incremental 100 TB pipeline runs instead of full recompute):
    * per-priority order counts + decimal-exact revenue kept as mergeable
    * STATE over the base slice (orderkey % 10 < 8), combined with the
    * delta batch's partial agg by key-outer-join + state addition —
    * counts add, decimal sums add exactly (that exactness is WHY the
    * state carries decimals, not doubles: double partials would drift
    * from the recompute under different add orders). `matches_full`
    * compares the merged state against a from-scratch recompute inside
    * the same plan, so the gate pins merge ≡ recompute row-by-row.
    * Scale: base and delta each one map-side-combined agg; the merge
    * joins |keys| rows; the recompute arm exists only for the audit.
    */
  private def incrMergeQ: Q =
    Q(
      "q_incr_merge",
      """WITH base AS (SELECT o_orderpriority AS priority, count(*)::BIGINT AS n,
        |         SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS s
        |       FROM orders WHERE o_orderkey % 10 < 8 GROUP BY 1),
        |  delta AS (SELECT o_orderpriority AS priority, count(*)::BIGINT AS n,
        |         SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS s
        |       FROM orders WHERE o_orderkey % 10 >= 8 GROUP BY 1),
        |  merged AS (SELECT coalesce(b.priority, d.priority) AS priority,
        |         coalesce(b.n, 0) + coalesce(d.n, 0) AS n,
        |         coalesce(b.s, 0) + coalesce(d.s, 0) AS s
        |       FROM base b FULL OUTER JOIN delta d ON d.priority = b.priority),
        |  full_r AS (SELECT o_orderpriority AS priority, count(*)::BIGINT AS n,
        |         SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS s
        |       FROM orders GROUP BY 1)
        |SELECT m.priority, m.n AS n_orders, CAST(m.s AS DOUBLE) AS revenue,
        |  (m.n = f.n AND m.s = f.s) AS matches_full
        |FROM merged m JOIN full_r f ON f.priority = m.priority""".stripMargin) {
      (s, d) =>
        val o = T.orders(s, d)
        def agg(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(expr("cast(o_totalprice as decimal(28,4))")).as("s"))
        val base = agg(o.filter("o_orderkey % 10 < 8"))
        val delta = agg(o.filter("o_orderkey % 10 >= 8"))
          .withColumnRenamed("priority", "dpriority")
          .withColumnRenamed("n", "dn").withColumnRenamed("s", "ds")
        val merged = base.join(delta,
          col("priority") === col("dpriority"), "full_outer")
          .selectExpr("coalesce(priority, dpriority) as priority",
            "coalesce(n, 0L) + coalesce(dn, 0L) as n",
            "coalesce(s, cast(0 as decimal(28,4))) + coalesce(ds, cast(0 as decimal(28,4))) as s")
        val full = agg(o).withColumnRenamed("priority", "fpriority")
          .withColumnRenamed("n", "fn").withColumnRenamed("s", "fs")
        merged.join(full, col("priority") === col("fpriority"))
          .selectExpr("priority", "n as n_orders", "cast(s as double) as revenue",
            "n = fn and s = fs as matches_full")
    }

  /** 16-bit Morton/Z-value of two 8-bit bucket columns `bx`, `by` —
    * bit i of bx lands at position 2i+1, bit i of by at 2i. Pure
    * div/mod integer arithmetic so the SAME formula renders on both
    * engines (only the integer-division operator differs).
    */
  private def z16(divOp: String): String =
    (0 until 8).map { i =>
      s"(((bx $divOp ${1 << i}) % 2) * ${1L << (2 * i + 1)} + " +
        s"((by $divOp ${1 << i}) % 2) * ${1L << (2 * i)})"
    }.mkString("(", " + ", ")")
  private def sparkZ16: String = z16("div")
  private def duckZ16: String = z16("//")
}
