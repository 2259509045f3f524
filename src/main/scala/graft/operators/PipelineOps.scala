package graft.operators

import graft.{Portable => P, Q, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.a pipeline (dataflow) operators, re-expressed Spark-first.
  *
  * Each entry is the Spark-native mapping of one tf.data operator the
  * reference manipulates (see /root/reference cited per query), plus a
  * DuckDB oracle proving the relational semantics. Determinism notes:
  * every ordinal is derived from an explicit total order (never partition
  * order), per SURVEY §7.4.
  *
  * Scale notes (100 TB): ordinal-dependent ops (batch, zip, shuffle) window
  * over a *sharding key* wherever the semantics allow, so the sort is
  * per-shard and parallel, not a single global sort. The global-ordinal
  * variants (take/skip/zip) are inherently sequential in any engine; they
  * push a sort + single-partition limit, which is exactly what a 1000-node
  * cluster would do too (sort is distributed; only the limit collapses).
  */
object PipelineOps {

  val queries: Seq[Q] = Seq(

    // op 1: TFRecordDataset source → parquet scan with pushdown
    // (graphdef_util.py:24; imagenet_input.py:168-170)
    Q(
      "op01_scan_pushdown",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity < 5 AND l_extendedprice < 20000
        |""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_quantity") < 5 && col("l_extendedprice") < 20000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    // op 2: TextLineDataset source (simple_gnmt/benchmark_mlperf.py:210-211)
    Q(
      "op02_source_text",
      "SELECT doc_id, n_chars FROM documents WHERE n_chars > 200") { (s, d) =>
      T.documents(s, d).filter(col("n_chars") > 200).select("doc_id", "n_chars")
    },

    // op 3: Dataset.list_files (imagenet_input.py:165) — file inventory
    // via input_file_name(), RELATIVIZED so the gate can oracle it:
    // absolute scan paths are engine-local, but the trailing
    // `<table>.parquet` segment and the per-table row count are
    // engine-independent facts DuckDB recomputes from the same views
    // (formerly a no_oracle row counting opaque absolute paths). The
    // regexp keeps working if a fixture ships as a parquet DIRECTORY —
    // part files live under `<table>.parquet/part-*`, so the segment
    // still matches. No physical part-file COUNT in the gate: how many
    // part files back a table is engine-local layout (like the absolute
    // paths), which DuckDB cannot recompute. Scale: one count-agg per
    // table scan, grouped on the extracted segment.
    Q(
      "op03_list_files",
      """SELECT 'documents.parquet' AS file,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM documents
        |UNION ALL
        |SELECT 'lineitem.parquet', count(*) FROM lineitem
        |UNION ALL
        |SELECT 'orders.parquet', count(*) FROM orders""".stripMargin) { (s, d) =>
      def inv(df: org.apache.spark.sql.DataFrame, name: String) = df
        .select(regexp_extract(input_file_name(),
          s"$name\\.parquet", 0).as("file"))
        .groupBy("file")
        .agg(count(lit(1)).cast("long").as("n_rows"))
      inv(T.documents(s, d), "documents")
        .unionAll(inv(T.lineitem(s, d), "lineitem"))
        .unionAll(inv(T.orders(s, d), "orders"))
    },

    // op 4: Dataset.range / from_tensor_slices (notebook/Example.ipynb)
    Q(
      "op04_range_source",
      """SELECT range AS id, range*2 AS twice, range*range AS square
        |FROM range(1000)""".stripMargin) { (s, _) =>
      s.range(1000).selectExpr("id", "id*2 as twice", "id*id as square")
    },

    // op 5: interleave / ParallelInterleaveDatasetV4 (graphdef_util.py:15):
    // round-robin merge of two sources with a deterministic interleave key.
    Q(
      "op05_interleave",
      """WITH src AS (
        |  SELECT 0 AS src, c_custkey AS key FROM customer
        |  UNION ALL SELECT 1 AS src, s_suppkey AS key FROM supplier)
        |SELECT CAST(src AS BIGINT) AS src, key,
        |       CAST(row_number() OVER (PARTITION BY src ORDER BY key) AS BIGINT) AS pos
        |FROM src""".stripMargin) { (s, d) =>
      val a = T.customer(s, d).selectExpr("cast(0 as bigint) as src", "c_custkey as key")
      val b = T.supplier(s, d).selectExpr("cast(1 as bigint) as src", "s_suppkey as key")
      val u = a.unionByName(b)
      u.withColumn(
        "pos",
        row_number().over(Window.partitionBy("src").orderBy("key")).cast("long"))
    },

    // op 6: map / ParallelMapDatasetV2 (graphdef_util.py:14): per-element
    // derived columns — pure projection, stays in whole-stage codegen.
    Q(
      "op06_map_derived",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        |FROM lineitem""".stripMargin) { (s, d) =>
      T.lineitem(s, d).selectExpr(
        "l_orderkey", "l_linenumber",
        "l_extendedprice * (1 - l_discount) as revenue",
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) as charge")
    },

    // op 7: filter / FilterDataset predicate (graphdef_util.py:214-222)
    Q(
      "op07_filter_predicate",
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' AND value > 10""".stripMargin) { (s, d) =>
      T.events(s, d)
        .filter(col("event_type") === "click" && col("value") > 10)
        .select("event_id", "user_id", "value")
    },

    // op 8: batch(16) (BatchDatasetV2, graphdef_util.py:19): consecutive
    // elements per shard grouped into batches. Sharded window → parallel.
    Q(
      "op08_batch",
      """WITH b AS (
        |  SELECT l_orderkey % 32 AS shard, l_orderkey, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey % 32
        |                       ORDER BY l_orderkey, l_linenumber, l_quantity) AS rn
        |  FROM lineitem)
        |SELECT shard, CAST(FLOOR((rn-1)/16.0) AS BIGINT) AS batch_id,
        |  count(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS qty_sum,
        |  min(l_orderkey) AS key_min, max(l_orderkey) AS key_max
        |FROM b GROUP BY shard, batch_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("shard").orderBy("l_orderkey", "l_linenumber", "l_quantity")
      T.lineitem(s, d)
        .withColumn("shard", col("l_orderkey") % 32)
        .withColumn("rn", row_number().over(w))
        .withColumn("batch_id", floor((col("rn") - 1) / 16))
        .groupBy("shard", "batch_id")
        .agg(
          count(lit(1)).as("n"),
          expr(P.dsum("l_quantity")).as("qty_sum"),
          min("l_orderkey").as("key_min"),
          max("l_orderkey").as("key_max"))
    },

    // op 8b: batch with drop_remainder=true → only full batches survive.
    Q(
      "op08b_batch_drop_remainder",
      """WITH b AS (
        |  SELECT l_orderkey % 32 AS shard, l_orderkey, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey % 32
        |                       ORDER BY l_orderkey, l_linenumber, l_quantity) AS rn
        |  FROM lineitem)
        |SELECT shard, CAST(FLOOR((rn-1)/16.0) AS BIGINT) AS batch_id, count(*) AS n
        |FROM b GROUP BY shard, batch_id HAVING count(*) = 16""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("shard").orderBy("l_orderkey", "l_linenumber", "l_quantity")
      T.lineitem(s, d)
        .withColumn("shard", col("l_orderkey") % 32)
        .withColumn("rn", row_number().over(w))
        .withColumn("batch_id", floor((col("rn") - 1) / 16))
        .groupBy("shard", "batch_id")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") === 16)
    },

    // op 9: padded_batch (iterator_utils.py:207-229): per-order quantity
    // vector padded to fixed length 8 with 0.0. The padded tensor is built
    // as a real array, then gated cell-by-cell via posexplode — the
    // driver's comparator can't hash array cells, and the exploded form
    // pins the EXACT content (value at every position) anyway.
    Q(
      "op09_padded_batch",
      """WITH v AS (SELECT l_orderkey,
        |  (list_concat(list(l_quantity ORDER BY l_linenumber, l_quantity),
        |               [0.0::DOUBLE,0.0::DOUBLE,0.0::DOUBLE,0.0::DOUBLE,
        |                0.0::DOUBLE,0.0::DOUBLE,0.0::DOUBLE,0.0::DOUBLE]))[1:8] AS padded
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey, u.pos AS pos, u.val AS val FROM (
        |  SELECT l_orderkey, unnest(list_transform(range(1, 9),
        |    i -> {'pos': CAST(i AS BIGINT), 'val': padded[i]})) AS u
        |  FROM v)""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("pairs"))
        .selectExpr(
          "l_orderkey",
          "slice(concat(transform(pairs, p -> p.l_quantity), array_repeat(0.0d, 8)), 1, 8) as padded")
        .selectExpr("l_orderkey", "posexplode(padded) as (pos0, val)")
        .selectExpr("l_orderkey", "cast(pos0 + 1 as bigint) as pos", "val")
    },

    // op 10: MapAndBatchDataset fusion (graphdef_util.py:13): map fused into
    // the batch aggregation — Catalyst collapses these into one stage.
    Q(
      "op10_map_and_batch",
      """WITH b AS (
        |  SELECT o_orderkey % 4 AS shard, o_orderkey,
        |    o_totalprice * 0.9 AS discounted,
        |    row_number() OVER (PARTITION BY o_orderkey % 4 ORDER BY o_orderkey) AS rn
        |  FROM orders)
        |SELECT shard, CAST(FLOOR((rn-1)/32.0) AS BIGINT) AS batch_id,
        |  count(*) AS n, CAST(SUM(CAST(discounted AS DECIMAL(28,4))) AS DOUBLE) AS disc_sum
        |FROM b GROUP BY shard, batch_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("shard").orderBy("o_orderkey")
      T.orders(s, d)
        .withColumn("shard", col("o_orderkey") % 4)
        .withColumn("discounted", col("o_totalprice") * 0.9)
        .withColumn("rn", row_number().over(w))
        .withColumn("batch_id", floor((col("rn") - 1) / 32))
        .groupBy("shard", "batch_id")
        .agg(count(lit(1)).as("n"), expr(P.dsum("discounted")).as("disc_sum"))
    },

    // op 11: shuffle(buffer, seed) (imagenet_input.py:198-202): seeded
    // deterministic permutation via a multiplicative-hash sort key (a full
    // shuffle is a strict superset of tf.data's reservoir shuffle). The
    // permutation is sharded by the hash itself — each shard sorts its own
    // slice in parallel (a global Window.orderBy would funnel every row
    // through ONE partition, the classic 100 TB scale-killer).
    Q(
      "op11_shuffle",
      """WITH s AS (SELECT l_orderkey, l_linenumber,
        |    (l_orderkey * 2654435761 + l_linenumber * 40503) % 999983 AS skey
        |  FROM lineitem WHERE l_orderkey % 10 = 0)
        |SELECT CAST(skey % 8 AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY skey % 8
        |    ORDER BY skey, l_orderkey, l_linenumber) AS BIGINT) AS pos,
        |  l_orderkey, l_linenumber
        |FROM s""".stripMargin) { (s, d) =>
      val skey = (col("l_orderkey") * 2654435761L + col("l_linenumber") * 40503L) % 999983L
      T.lineitem(s, d)
        .filter(col("l_orderkey") % 10 === 0)
        .withColumn("skey", skey)
        .withColumn("shard", (col("skey") % 8).cast("long"))
        .withColumn(
          "pos",
          row_number()
            .over(Window.partitionBy("shard")
              .orderBy(col("skey"), col("l_orderkey"), col("l_linenumber")))
            .cast("long"))
        .select("shard", "pos", "l_orderkey", "l_linenumber")
    },

    // op 11b: exact bounded-buffer shuffle via the reservoir_sample
    // TypedImperativeAggregate (tf.data's true shuffle semantics) —
    // sampling is engine-internal, so rows-only gate; the aggregate's
    // invariants are pinned in ReservoirSampleSpec.
    Q.noOracle("op11b_reservoir_shuffle") { (s, d) =>
      graft.functions.ReservoirSample.register(s)
      T.lineitem(s, d).createOrReplaceTempView("li_reservoir")
      s.sql(
        """select shard, explode(sample) as l_orderkey from (
          |  select l_orderkey % 4 as shard,
          |         reservoir_sample(l_orderkey, 64, 7L) as sample
          |  from li_reservoir group by l_orderkey % 4)""".stripMargin)
    },

    // op 11c: DETERMINISTIC reservoir shuffle (VERDICT r15 #5) — exactly
    // Algorithm R's buffer semantics (the op11b aggregate's contract),
    // but with every random decision derived from (seed, position)
    // instead of a PRNG over arrival order, so the final reservoir is a
    // pure function of the data and DuckDB reproduces it bit-for-bit
    // (op11b stays no_oracle only because MLlib-free arrival order
    // can't: this variant shrinks the unverifiable surface to dd07).
    // The sequential recurrence is expressed RELATIONALLY: position i
    // fills slot i while i <= k; for i > k the hash draw j(i) =
    // H(seed, shard, i) mod i + 1 replaces slot j(i) iff j(i) <= k —
    // so slot s's final occupant is simply the element at the LARGEST
    // position that ever wrote s (max_by), no stateful fold needed.
    // Scale: per-stream positions ride a stream-sharded window (the
    // op11 convention — a bounded shuffle buffer is sequential PER
    // STREAM in tf.data too; parallelism scales with streams), and the
    // k·streams result rows partial-aggregate map-side.
    Q(
      "op11c_reservoir_det",
      s"""WITH p AS (SELECT l_orderkey % 4 AS shard, l_orderkey,
         |    row_number() OVER (PARTITION BY l_orderkey % 4
         |      ORDER BY l_orderkey, l_linenumber, l_quantity) AS i
         |  FROM lineitem),
         |  s AS (SELECT shard, i, l_orderkey,
         |    CASE WHEN i <= 64 THEN i
         |         ELSE ${P.duckHash60("'res|7|' || shard::VARCHAR || '|' || i::VARCHAR")} % i + 1
         |    END AS slot
         |  FROM p)
         |SELECT CAST(shard AS BIGINT) AS shard, CAST(slot AS BIGINT) AS slot,
         |  CAST(arg_max(l_orderkey, i) AS BIGINT) AS l_orderkey
         |FROM s WHERE slot <= 64 GROUP BY shard, slot""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("shard")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
      val h = P.hash60(
        "concat('res|7|', cast(shard as string), '|', cast(i as string))")
      T.lineitem(s, d)
        .withColumn("shard", col("l_orderkey") % 4)
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("slot",
          when(col("i") <= 64, col("i"))
            .otherwise(expr(s"pmod($h, i) + 1")))
        .filter(col("slot") <= 64)
        .groupBy("shard", "slot")
        .agg(expr("max_by(l_orderkey, i)").cast("long").as("l_orderkey"))
        .selectExpr("cast(shard as bigint) as shard",
          "cast(slot as bigint) as slot", "l_orderkey")
    },

    // op 12: repeat(3) (graphdef_util.py:566-601)
    Q(
      "op12_repeat",
      """SELECT o_orderkey, CAST(r.range AS BIGINT) AS copy
        |FROM orders CROSS JOIN range(3) r
        |WHERE o_orderkey % 100 = 0""".stripMargin) { (s, d) =>
      T.orders(s, d)
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), explode(sequence(lit(0L), lit(2L))).as("copy"))
    },

    // op 13: take(n) (graphdef_util.py:519-563) — ordered for determinism
    Q(
      "op13_take",
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100") {
      (s, d) =>
        T.orders(s, d).orderBy("o_orderkey").limit(100)
          .select("o_orderkey", "o_totalprice")
    },

    // op 14: skip(n) (imagenet_input.py:188-194)
    Q(
      "op14_skip",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 200 OFFSET 1000""".stripMargin) { (s, d) =>
      T.orders(s, d).orderBy("o_orderkey").offset(1000).limit(200)
        .select("o_orderkey", "o_totalprice")
    },

    // op 15: shard(num_shards, index) (imagenet_input.py:167)
    Q(
      "op15_shard",
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey % 4 = 1") {
      (s, d) =>
        T.lineitem(s, d)
          .filter(col("l_orderkey") % 4 === 1)
          .select("l_orderkey", "l_linenumber")
    },

    // op 16: cache() (graphdef_util.py:618-643): materialize once, reuse for
    // two downstream aggregations (semantics identical to the uncached plan).
    Q(
      "op16_cache_reuse",
      """SELECT 'flag' AS tag, l_returnflag AS key, count(*) AS n
        |FROM lineitem WHERE l_quantity > 25 GROUP BY l_returnflag
        |UNION ALL
        |SELECT 'status' AS tag, l_linestatus AS key, count(*) AS n
        |FROM lineitem WHERE l_quantity > 25 GROUP BY l_linestatus""".stripMargin) {
      (s, d) =>
        val base = T.lineitem(s, d).filter(col("l_quantity") > 25).cache()
        val byFlag = base.groupBy(col("l_returnflag").as("key"))
          .agg(count(lit(1)).as("n")).withColumn("tag", lit("flag"))
        val bySt = base.groupBy(col("l_linestatus").as("key"))
          .agg(count(lit(1)).as("n")).withColumn("tag", lit("status"))
        byFlag.unionByName(bySt).select("tag", "key", "n")
    },

    // op 17: prefetch(buffer) (graphdef_util.py:603-616): stage pipelining is
    // implicit in Spark — semantically an identity; kept for IR parity.
    Q(
      "op17_prefetch_noop",
      """SELECT o_orderkey FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'""".stripMargin) {
      (s, d) =>
        T.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
          .select("o_orderkey")
    },

    // op 18: zip (iterator_utils.py:55): positional join, truncating at the
    // shorter input (tf.data zip semantics). The positional ordinal is
    // inherently global, but it's computed DISTRIBUTED via the zipWithIndex
    // composition (Ordinal.withGlobalOrdinal): range-bucketed per-partition
    // ranks + broadcast prefix offsets — no single-partition global sort.
    Q(
      "op18_zip",
      """WITH a AS (SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS rn FROM customer),
        |     b AS (SELECT s_suppkey, row_number() OVER (ORDER BY s_suppkey) AS rn FROM supplier)
        |SELECT CAST(a.rn AS BIGINT) AS rn, a.c_custkey, b.s_suppkey
        |FROM a JOIN b ON a.rn = b.rn""".stripMargin) { (s, d) =>
      val a = Ordinal.withGlobalOrdinal(T.customer(s, d), "c_custkey", "rn")
      val b = Ordinal.withGlobalOrdinal(T.supplier(s, d), "s_suppkey", "rn")
      a.join(b, "rn").select("rn", "c_custkey", "s_suppkey")
    },

    // op 18b: zip positioned by a STRING order key (VERDICT r17 #2) — the
    // shape that used to funnel through a single-partition global window
    // (approxQuantile can't sketch string boundaries) now rides the same
    // distributed ordinal with RangePartitioner-style sampled boundary
    // strings (Ordinal.sampledStringSplits): per-bucket ranks + broadcast
    // prefix offsets, no corpus-sized sort on one task. Tie columns pin a
    // total order so the oracle hash is deterministic.
    Q(
      "op18b_zip_string",
      """WITH a AS (SELECT c_name, c_custkey,
        |            row_number() OVER (ORDER BY c_name, c_custkey) AS rn
        |           FROM customer),
        |     b AS (SELECT s_name, s_suppkey,
        |            row_number() OVER (ORDER BY s_name, s_suppkey) AS rn
        |           FROM supplier)
        |SELECT CAST(a.rn AS BIGINT) AS rn, a.c_name, b.s_name
        |FROM a JOIN b ON a.rn = b.rn""".stripMargin) { (s, d) =>
      val a = Ordinal.withGlobalOrdinal(T.customer(s, d), "c_name", "rn",
        tieCols = Seq("c_custkey"))
      val b = Ordinal.withGlobalOrdinal(T.supplier(s, d), "s_name", "rn",
        tieCols = Seq("s_suppkey"))
      a.join(b, "rn").select("rn", "c_name", "s_name")
    },

    // op 19: concatenate (imagenet_input.py:191-197): order-preserving union
    // via an explicit source ordinal.
    Q(
      "op19_concatenate",
      """SELECT 0 AS src, c_custkey AS key, c_name AS name FROM customer
        |UNION ALL
        |SELECT 1 AS src, s_suppkey AS key, s_name AS name FROM supplier""".stripMargin) {
      (s, d) =>
        T.customer(s, d).selectExpr("0 as src", "c_custkey as key", "c_name as name")
          .unionByName(
            T.supplier(s, d).selectExpr("1 as src", "s_suppkey as key", "s_name as name"))
    },

    // op 20: flat_map / data echoing (dataset_echoing.py:17-63): element
    // repeated e(x) = 1 + id%2 times.
    Q(
      "op20_flat_map_echo",
      """SELECT event_id, unnest(range(0, 1 + event_id % 2)) AS copy
        |FROM events WHERE event_id < 200""".stripMargin) { (s, d) =>
      T.events(s, d)
        .filter(col("event_id") < 200)
        .select(
          col("event_id"),
          explode(sequence(lit(0L), col("event_id") % 2)).as("copy"))
    },

    // op 20b: Bernoulli-smoothed data echoing (dataset_echoing.py:37-44):
    // fractional echo factor e=1.3 → every element once, plus a second
    // copy for the 30 % selected by a seeded portable hash.
    Q(
      "op20b_echo_bernoulli",
      s"""SELECT event_id, unnest(range(0,
         |  1 + CASE WHEN ${P.duckHash60("'echo7|' || CAST(event_id AS VARCHAR)")} % 1000 < 300
         |      THEN 1 ELSE 0 END)) AS copy
         |FROM events WHERE event_id < 400""".stripMargin) { (s, d) =>
      T.events(s, d)
        .filter(col("event_id") < 400)
        .selectExpr(
          "event_id",
          s"explode(sequence(0L, case when ${P.hash60("concat('echo7|', cast(event_id as string))")} % 1000 < 300 " +
            "then 1L else 0L end)) as copy")
    },

    // op 21: unbatch (dataset_echoing.py:47-55): batch → posexplode round
    // trip; pos is the 1-based position within the batch.
    Q(
      "op21_unbatch",
      """SELECT l_orderkey,
        |  CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS BIGINT) AS pos,
        |  l_quantity AS qty
        |FROM lineitem WHERE l_orderkey % 50 = 0""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_orderkey") % 50 === 0)
        .groupBy("l_orderkey")
        .agg(array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("pairs"))
        .selectExpr("l_orderkey", "posexplode(transform(pairs, p -> p.l_quantity)) as (p0, qty)")
        .selectExpr("l_orderkey", "cast(p0 + 1 as bigint) as pos", "qty")
    },

    // op 22: group_by_window (iterator_utils.py:231-255): GNMT-style length
    // bucketing — bucket by token-length band, batch within bucket.
    Q(
      "op22_group_by_window",
      """WITH toks AS (
        |  SELECT doc_id, len(regexp_split_to_array(text, '\s+')) AS ntok FROM documents),
        |     bkt AS (
        |  SELECT doc_id, ntok, CAST(FLOOR(ntok/10.0) AS BIGINT) AS bucket,
        |    row_number() OVER (PARTITION BY CAST(FLOOR(ntok/10.0) AS BIGINT)
        |                       ORDER BY doc_id) AS rn
        |  FROM toks)
        |SELECT bucket, CAST(FLOOR((rn-1)/4.0) AS BIGINT) AS wid, count(*) AS n,
        |  CAST(max(ntok) AS BIGINT) AS max_tok, min(doc_id) AS doc_min
        |FROM bkt GROUP BY bucket, wid""".stripMargin) { (s, d) =>
      val toks = T.documents(s, d)
        .selectExpr("doc_id", "size(split(text, '\\\\s+')) as ntok")
      val w = Window.partitionBy("bucket").orderBy("doc_id")
      toks
        .withColumn("bucket", floor(col("ntok") / 10.0))
        .withColumn("rn", row_number().over(w))
        .withColumn("wid", floor((col("rn") - 1) / 4))
        .groupBy("bucket", "wid")
        .agg(
          count(lit(1)).as("n"),
          max("ntok").cast("long").as("max_tok"),
          min("doc_id").as("doc_min"))
    },

    // op 23: choose_from_datasets (simple_rcnn/dataloader.py:518-520): an
    // index expression routes each element through one of three branches.
    Q(
      "op23_choose_from",
      """SELECT event_id, CAST(event_id % 3 AS BIGINT) AS choice,
        |  CASE WHEN event_id % 3 = 0 THEN value * 2
        |       WHEN event_id % 3 = 1 THEN value + 100
        |       ELSE -value END AS routed
        |FROM events WHERE event_id < 300""".stripMargin) { (s, d) =>
      T.events(s, d)
        .filter(col("event_id") < 300)
        .selectExpr(
          "event_id",
          "cast(event_id % 3 as bigint) as choice",
          "case when event_id % 3 = 0 then value * 2 " +
            "when event_id % 3 = 1 then value + 100 else -value end as routed")
    },

    // op 26: RestructuredDataset (annotations.py:56-64): coerce a frame to
    // a target element spec — casts + renames + column order.
    Q(
      "op26_restructure",
      """SELECT o_orderkey AS key, CAST(o_totalprice AS DOUBLE) AS amount,
        |  CAST(o_custkey AS INT) AS cust32, o_orderstatus AS status
        |FROM orders WHERE o_orderkey <= 500""".stripMargin) { (s, d) =>
      T.orders(s, d)
        .filter(col("o_orderkey") <= 500)
        .selectExpr(
          "o_orderkey as key",
          "cast(o_totalprice as double) as amount",
          "cast(o_custkey as int) as cust32",
          "o_orderstatus as status")
    }
    // ops 24/27/28 (with_options wrappers, tf.data service distribute,
    // determinism/threadpool options) are session-level configuration in
    // Spark, not plan nodes — recorded as such in SURVEY §2.a; nothing to
    // compile or gate.
  )
}
