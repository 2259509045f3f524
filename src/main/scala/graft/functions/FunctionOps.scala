package graft.functions

import graft.{Portable => P, Q, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.b — scalar/UDF function families that run *inside* pipeline
  * operators in the reference (TFExample parsing, text/NLP, control flow,
  * vector math). All are expressed as codegen-friendly built-in functions,
  * never Scala closures, so they stay inside whole-stage codegen.
  */
object FunctionOps {

  val queries: Seq[Q] = Seq(

    // Parse-fields family (imagenet_input.py:42-48): typed field extraction
    // with defaults (FixedLenFeature default handling → coalesce).
    Q(
      "fn01_parse_fields",
      """SELECT event_id,
        |  COALESCE(json_extract(props, 'k')::BIGINT, -1) AS k,
        |  COALESCE(user_id, -1) AS uid
        |FROM events WHERE event_id < 500""".stripMargin) { (s, d) =>
      T.events(s, d)
        .filter(col("event_id") < 500)
        .selectExpr(
          "event_id",
          "coalesce(cast(get_json_object(props, '$.k') as bigint), -1) as k",
          "coalesce(user_id, -1) as uid")
    },

    // Tokenize + hash-bucket (iterator_utils.py:64-66; strings.to_hash_bucket_fast):
    // portable 60-bit md5 hash of the first token, bucketed mod 64.
    Q(
      "fn02_tokenize_hashbucket",
      s"""SELECT doc_id,
         |  CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS ntok,
         |  ${P.duckHash60("regexp_split_to_array(text, '\\s+')[1]")} % 64 AS bucket
         |FROM documents""".stripMargin) { (s, d) =>
      T.documents(s, d).selectExpr(
        "doc_id",
        "cast(size(split(text, '\\\\s+')) as bigint) as ntok",
        s"${P.hash60("element_at(split(text, '\\\\s+'), 1)")} % 64 as bucket")
    },

    // Vocab-table lookup (iterator_utils.py:90-141): broadcast join against
    // small dimension tables (the Spark-native vocab lookup).
    Q(
      "fn03_vocab_lookup",
      """SELECT s_suppkey, n_name, r_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey""".stripMargin) { (s, d) =>
      T.supplier(s, d)
        .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "n_name", "r_name")
    },

    // Control flow (imagenet_input.py:86-87: tf.cond; dataloader gather):
    // when/otherwise + element_at over an inline array.
    Q(
      "fn04_control_flow",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CASE l_returnflag WHEN 'A' THEN 1 WHEN 'N' THEN 2 WHEN 'R' THEN 3
        |       ELSE 0 END AS BIGINT) AS flagcode,
        |  (['lo','mid','hi'])[LEAST(3, 1 + CAST(FLOOR(l_quantity/20.0) AS INT))] AS qclass
        |FROM lineitem WHERE l_orderkey % 20 = 0""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_orderkey") % 20 === 0)
        .selectExpr(
          "l_orderkey",
          "l_linenumber",
          "cast(case l_returnflag when 'A' then 1 when 'N' then 2 when 'R' then 3 " +
            "else 0 end as bigint) as flagcode",
          "element_at(array('lo','mid','hi'), least(3, 1 + cast(floor(l_quantity/20.0) as int))) as qclass")
    },

    // Vector math on Array[Float] (simple_ssd/dataloader.py:263-320 label
    // assigner analogue): left-fold so the IEEE add order matches DuckDB's
    // list_reduce exactly.
    Q(
      "fn05_vector_math",
      """SELECT vec_id,
        |  list_reduce(list_prepend(0.0::DOUBLE,
        |    list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), (a, x) -> a + x) AS norm2,
        |  list_reduce(list_prepend(0.0::DOUBLE,
        |    list_transform(embedding, x -> abs(x::DOUBLE))), (a, x) -> a + x) AS l1
        |FROM embeddings WHERE vec_id < 100""".stripMargin) { (s, d) =>
      T.embeddings(s, d)
        .filter(col("vec_id") < 100)
        .selectExpr(
          "vec_id",
          "aggregate(embedding, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double)) as norm2",
          "aggregate(embedding, cast(0.0 as double), (a, x) -> a + abs(cast(x as double))) as l1")
    },

    // String ops family (string_split/substr/concat, iterator_utils.py:142-166)
    Q(
      "fn06_string_ops",
      """SELECT doc_id, substr(lower(text), 1, 10) AS head10,
        |  CAST(length(text) AS BIGINT) AS len,
        |  upper(substr(text, 1, 5)) AS shout,
        |  concat(lang, ':', source) AS tag
        |FROM documents""".stripMargin) { (s, d) =>
      T.documents(s, d).selectExpr(
        "doc_id",
        "substr(lower(text), 1, 10) as head10",
        "cast(length(text) as bigint) as len",
        "upper(substr(text, 1, 5)) as shout",
        "concat(lang, ':', source) as tag")
    },

    // sos/eos concat over token-id arrays (iterator_utils.py:169-193):
    // ids = portable hashes of tokens, bounded to vocab 1000, wrapped
    // 1|ids|2. Built as a real array, gated per-position via posexplode
    // (driver's comparator can't hash array cells; the exploded form pins
    // the exact sequence — sos at pos 1, eos at pos len).
    Q(
      "fn07_sos_eos_tokens",
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+')[1:6] AS toks
         |           FROM documents WHERE doc_id < 50),
         |  v AS (SELECT doc_id,
         |    list_concat(list_concat([1::BIGINT],
         |      list_transform(toks, w -> 3 + ${P.duckHash60("w")} % 997)), [2::BIGINT]) AS ids
         |  FROM t)
         |SELECT doc_id, u.pos AS pos, u.tok_id AS tok_id FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ids) + 1),
         |    i -> {'pos': CAST(i AS BIGINT), 'tok_id': ids[i]})) AS u
         |  FROM v)""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .filter(col("doc_id") < 50)
        .selectExpr("doc_id", "slice(split(text, '\\\\s+'), 1, 6) as toks")
        .selectExpr(
          "doc_id",
          s"concat(array(1L), transform(toks, w -> 3 + ${P.hash60("w")} % 997), array(2L)) as ids")
        .selectExpr("doc_id", "posexplode(ids) as (pos0, tok_id)")
        .selectExpr("doc_id", "cast(pos0 + 1 as bigint) as pos", "tok_id")
    },

    // Tensor-shaping family (imagenet_input.py:122-132; reshape/split/pad/
    // slice/flatten): higher-order array functions over a per-order
    // quantity "tensor" — reshape 8→2×4, pad, slice, flatten back.
    // The 8-vector is reshaped 2×4 and gated cell-by-cell: (pos, r, c)
    // prove the reshape arithmetic, in_slice marks the t[3:6] slice, and
    // the per-order left-fold checksum rides along on every cell. Scalar
    // cells only — the driver's comparator can't hash array columns.
    Q(
      "fn08_tensor_shaping",
      """WITH v AS (
        |  SELECT l_orderkey,
        |    (list_concat(list(l_quantity ORDER BY l_linenumber, l_quantity),
        |     [0.0::DOUBLE,0.0::DOUBLE,0.0::DOUBLE,0.0::DOUBLE,
        |      0.0::DOUBLE,0.0::DOUBLE,0.0::DOUBLE,0.0::DOUBLE]))[1:8] AS t
        |  FROM lineitem WHERE l_orderkey % 25 = 0 GROUP BY l_orderkey),
        |  w AS (SELECT l_orderkey, t,
        |    list_reduce(list_prepend(0.0::DOUBLE, t), (a, x) -> a + x) AS checksum
        |  FROM v)
        |SELECT l_orderkey, u.pos AS pos, u.r AS r, u.c AS c,
        |  u.in_slice AS in_slice, u.val AS val, checksum FROM (
        |  SELECT l_orderkey, checksum, unnest(list_transform(range(1, 9), i -> {
        |    'pos': CAST(i AS BIGINT),
        |    'r': CAST((i - 1) // 4 + 1 AS BIGINT),
        |    'c': CAST((i - 1) % 4 + 1 AS BIGINT),
        |    'in_slice': CAST(CASE WHEN i BETWEEN 3 AND 6 THEN 1 ELSE 0 END AS BIGINT),
        |    'val': t[i]})) AS u
        |  FROM w)""".stripMargin) { (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_orderkey") % 25 === 0)
        .groupBy("l_orderkey")
        .agg(array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("pairs"))
        .selectExpr(
          "l_orderkey",
          "slice(concat(transform(pairs, p -> p.l_quantity), array_repeat(0.0d, 8)), 1, 8) as t")
        .selectExpr(
          "l_orderkey",
          "aggregate(t, cast(0.0 as double), (a, x) -> a + x) as checksum",
          "posexplode(t) as (pos0, val)")
        .selectExpr(
          "l_orderkey",
          "cast(pos0 + 1 as bigint) as pos",
          "cast(pos0 div 4 + 1 as bigint) as r",
          "cast(pos0 % 4 + 1 as bigint) as c",
          "cast(case when pos0 + 1 between 3 and 6 then 1 else 0 end as bigint) as in_slice",
          "val",
          "checksum")
    },

    // Semi-structured parsing: the events.props JSON column → typed field
    // plus a rolled-up per-type aggregate of the extracted value. The
    // tf.Example-parsing sibling for JSON payloads; get_json_object is
    // codegen'd, so extraction fuses into the scan projection.
    Q(
      "fn09_json_extract",
      """WITH x AS (SELECT event_type,
        |             CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |           FROM events)
        |SELECT event_type, count(*) AS n, CAST(SUM(k) AS BIGINT) AS k_sum,
        |  CAST(MAX(k) AS BIGINT) AS k_max
        |FROM x GROUP BY event_type""".stripMargin) { (s, d) =>
      graft.Tables.events(s, d)
        .selectExpr(
          "event_type",
          "cast(get_json_object(props, '$.k') as bigint) as k")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum("k").cast("long").as("k_sum"),
          max("k").cast("long").as("k_max"))
    },

    // Feature hashing (the hashing trick): tokens → a fixed 16-bucket
    // count vector via the portable 60-bit hash — the dimensionality-
    // free featurizer quality classifiers train on. Emitted as
    // (doc_id, bucket, cnt) rows; the whole thing is one codegen'd scan
    // projection + explode, no vocabulary build, no shuffle.
    Q(
      "fn10_feature_hash",
      s"""WITH t AS (SELECT doc_id,
         |    regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents)
         |SELECT doc_id, CAST(b AS BIGINT) AS bucket,
         |  CAST(len(list_filter(toks, w -> ${graft.Portable.duckHash60("w")} % 16 = b)) AS BIGINT) AS cnt
         |FROM t CROSS JOIN range(0, 16) r(b)""".stripMargin) { (s, d) =>
      graft.Tables.documents(s, d)
        .selectExpr("doc_id", "split(lower(text), '\\\\s+') as toks")
        // hash each token ONCE per document (md5 is the per-row cost
        // driver): the 16-way bucket fan-out then counts over the
        // precomputed bucket ids instead of re-hashing every token per
        // bucket — 16x the md5 work, exposed r16 by the honest
        // noop-materialization bench (count() had pruned it all)
        .selectExpr("doc_id",
          s"transform(toks, w -> ${graft.Portable.hash60("w")} % 16) as hb")
        .selectExpr("doc_id", "explode(sequence(0, 15)) as bucket", "hb")
        .selectExpr("doc_id", "cast(bucket as bigint) as bucket",
          "cast(size(filter(hb, h -> h = bucket)) as bigint) as cnt")
    },

    // Vocabulary count-vectorizer: each document against the corpus
    // top-16 vocabulary (tx09's vocab build) as (doc_id, slot, word,
    // cnt) ROWS with zeros preserved — fn10's hashing-trick twin with a
    // REAL vocabulary, the bag-of-words featurizer behind linear
    // quality classifiers. Rows, not a dense ARRAY column, per the op09
    // unnest convention: every (doc, slot) pair exists because the
    // 16-row slotted vocab broadcast-fans each document 16×, so absent
    // words appear as cnt=0 rows (a count rollup alone can't give
    // zeros) and every output cell is a plain sortable scalar.
    // n_invocab/n_toks repeat per row as per-doc invariants checked by
    // the spec (sum(cnt) over slots == n_invocab). Scale: vectorization
    // is corpus-scan × broadcast-tiny-table work — the only corpus
    // exchange anywhere is the vocab count rollup, which ships (word,
    // count) longs, never documents.
    Q(
      "fn11_count_vector",
      s"""WITH t AS (SELECT doc_id,
         |      regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents),
         |  cnt AS (SELECT w, count(*)::BIGINT AS n
         |          FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
         |  vocab AS (SELECT w, n FROM cnt ORDER BY n DESC, w LIMIT 16),
         |  vs AS (SELECT w, row_number() OVER (ORDER BY n DESC, w) AS slot FROM vocab),
         |  vl AS (SELECT list(w ORDER BY n DESC, w) AS vw FROM vocab)
         |SELECT doc_id,
         |  CAST(vs.slot AS BIGINT) AS slot, vs.w AS word,
         |  CAST(len(list_filter(t.toks, x -> x = vs.w)) AS BIGINT) AS cnt,
         |  CAST(len(list_filter(t.toks, x -> list_contains(vl.vw, x))) AS BIGINT) AS n_invocab,
         |  CAST(len(t.toks) AS BIGINT) AS n_toks
         |FROM t CROSS JOIN vs CROSS JOIN vl""".stripMargin) { (s, d) =>
      val t = graft.Tables.spread(graft.Tables.documents(s, d))
        .selectExpr("doc_id", "split(lower(text), '\\\\s+') as toks")
      // ONE broadcast of the slotted vocab as a sorted struct array —
      // a separate slots + word-list broadcast would evaluate the
      // corpus-wide vocab rollup twice; the 16-way row fan-out comes
      // from exploding the broadcast array, not a second pass
      val slotted = t.selectExpr("explode(toks) as w")
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(16)
        .selectExpr("w", "cast(row_number() over (order by n desc, w) as bigint) as slot")
        .agg(expr("array_sort(collect_list(struct(slot, w)))").as("vs"))
      t.crossJoin(broadcast(slotted))
        // per-document invariants computed BELOW the generate: after the
        // 16-way explode they would be recomputed once per slot row, and
        // n_invocab's lambda would rebuild transform(vs, …) per token —
        // 16x the scan work (exposed r16 by the honest bench; the old
        // count() action had pruned these columns away entirely)
        .withColumn("vw", expr("transform(vs, y -> y.w)"))
        .withColumn("n_invocab",
          expr("cast(size(filter(toks, x -> array_contains(vw, x))) as bigint)"))
        .withColumn("n_toks", expr("cast(size(toks) as bigint)"))
        .select(col("doc_id"), col("toks"), col("n_invocab"), col("n_toks"),
          explode(col("vs")).as("v"))
        .selectExpr("doc_id", "v.slot as slot", "v.w as word",
          "cast(size(filter(toks, x -> x = v.w)) as bigint) as cnt",
          "n_invocab", "n_toks")
    },

    // TFExample wire-format round-trip with FixedLenFeature defaults —
    // the REAL record payload behind fn01's parse-fields semantics
    // (imagenet_input.py:42-48: parse_single_example over tf.train.
    // Example protos inside TFRecord files). Documents encode as
    // genuine Example protobufs (graft.sources.TfExample — int64 +
    // bytes features, canonical packed wire bytes, no TF dependency),
    // ride TFRecord shards (graft.sources.TfRecords, both CRCs
    // verified), parse back, and aggregate ≡ the original table. The
    // defaults arm is real: every 10th document OMITS its lang feature
    // and the parse supplies 'und' — the absent-key-means-default
    // contract, exercised through actual absent wire bytes, not a
    // COALESCE over NULLs. Scale: encode/decode are per-record byte
    // arithmetic inside Dataset maps (no driver, no shuffle before the
    // final rollup); shards are the read-parallelism unit.
    Q(
      "fn12_tfexample_roundtrip",
      """SELECT CASE WHEN doc_id % 10 = 0 THEN 'und' ELSE lang END AS lang,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(length(text)) AS BIGINT) AS chars,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM documents GROUP BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.sources.{TfExample, TfRecords}
      val path = graft.operators.Scratch.dir("graft-tfex-docs")
      val encoded = T.documents(s, d)
        .selectExpr("doc_id", "text", "lang", "n_chars")
        .as[(Long, String, String, Long)]
        .map { case (id, text, lang, nc) =>
          val base = Seq(
            "doc_id" -> TfExample.Feature(longs = Seq(id)),
            "text" -> TfExample.Feature(bytes = Seq(text.getBytes("UTF-8"))),
            "n_chars" -> TfExample.Feature(longs = Seq(nc)))
          TfExample.encode(
            if (id % 10 == 0) base // defaults arm: lang feature ABSENT
            else base :+ ("lang" -> TfExample.Feature(
              bytes = Seq(lang.getBytes("UTF-8")))))
        }
        .toDF("rec")
      TfRecords.write(encoded, "rec", path)
      TfRecords.read(s, path)
        .select("record").as[Array[Byte]]
        .map { rec =>
          val m = TfExample.decode(rec)
          (TfExample.stringUtf8(m, "lang", "und"), // FixedLenFeature default
            TfExample.int64(m, "doc_id", -1L),
            TfExample.stringUtf8(m, "text", ""),
            TfExample.int64(m, "n_chars", -1L))
        }
        .toDF("lang", "doc_id", "text", "nc")
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("doc_id").cast("long").as("id_sum"),
          sum(length(col("text"))).cast("long").as("chars"),
          sum("nc").cast("long").as("n_chars"))
    },

    // VarLenFeature round-trip: each document's per-token length list
    // rides as a variable-length int64 feature (fn12 gates the scalar
    // FixedLen path; this gates the LIST path — the shape token-id
    // sequences actually take in training records). The token lists are
    // derived ONCE in Spark SQL (fn02's pinned split semantics) before
    // encoding, so the Scala codec layer never re-tokenizes; the decode
    // side aggregates the recovered lists with codegen'd HOFs. Scale:
    // same partition-local encode/parse as fn12, one final doc-keyed
    // projection — no exchange at all (the output is per-document).
    Q(
      "fn13_varlen_roundtrip",
      s"""WITH t AS (SELECT doc_id,
         |    list_transform(regexp_split_to_array(text, '\\s+'),
         |      x -> length(x)) AS ls
         |  FROM documents)
         |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_toks,
         |  CAST(list_reduce(list_prepend(0, ls), (a, b) -> a + b) AS BIGINT) AS len_sum,
         |  CAST(list_max(ls) AS BIGINT) AS max_len
         |FROM t""".stripMargin) { (s, d) =>
      import s.implicits._
      import graft.sources.{TfExample, TfRecords}
      val path = graft.operators.Scratch.dir("graft-tfex-varlen")
      val encoded = T.documents(s, d)
        .selectExpr("doc_id",
          "transform(split(text, '\\\\s+'), x -> cast(length(x) as bigint)) as ls")
        .as[(Long, Seq[Long])]
        .map { case (id, ls) =>
          TfExample.encode(Seq(
            "doc_id" -> TfExample.Feature(longs = Seq(id)),
            "tok_lens" -> TfExample.Feature(longs = ls)))
        }
        .toDF("rec")
      TfRecords.write(encoded, "rec", path)
      TfRecords.read(s, path)
        .select("record").as[Array[Byte]]
        .map { rec =>
          val m = TfExample.decode(rec)
          (TfExample.int64(m, "doc_id", -1L),
            TfExample.int64List(m, "tok_lens").toArray)
        }
        .toDF("doc_id", "ls")
        .selectExpr("doc_id",
          "cast(size(ls) as bigint) as n_toks",
          "aggregate(ls, 0L, (a, b) -> a + b) as len_sum",
          "array_max(ls) as max_len")
    },

    // The GNMT/Transformer text-ingest chain COMPOSED end-to-end
    // (VERDICT r16 #1 — 2 of the reference's 5 MLPerf workload shapes had
    // no composed twin; composition bugs like the bucket-boundary ×
    // padding interaction never show in per-operator gates): tokenize →
    // vocab lookup with OOV hash buckets (iterator_utils.py:90-141's
    // hash-lookup semantics; fn03/fn02's pieces) → sos/eos wrap
    // (iterator_utils.py:64-66,169-193; fn07) → group_by_window length
    // bucketing (iterator_utils.py:231-255; op22) → padded_batch to the
    // BATCH max length (iterator_utils.py:207-229; op09), emitted
    // cell-by-cell per the op09 unnest convention. Id space: 0 pad,
    // 1 sos, 2 eos, 4..19 the top-16 vocab by corpus frequency (3+slot),
    // 20..83 OOV hash buckets (20 + hash60 % 64 — to_hash_bucket_fast).
    // Sequence lengths vary per doc (first 3 + doc_id%6 tokens) so the
    // bucket × window × pad interaction is genuinely exercised.
    // Scale: the corpus path is ONE scan; the vocab is a token-only
    // rollup broadcast as a single sorted array (fn11's idiom — lookup
    // happens inside the scan projection, no per-token join explosion);
    // bucketing pays ONE hash exchange on `bucket`, and the batch-max
    // window reuses that partitioning (hashpartitioning(bucket)
    // satisfies ClusteredDistribution(bucket, wid) — subset rule), so
    // padded_batch adds a sort, never a second corpus shuffle
    // (plan-pinned in PlanQualitySpec).
    Q(
      "fn14_wmt_ingest",
      s"""WITH t AS (SELECT doc_id,
         |    regexp_split_to_array(lower(text), '\\s+')[1:(3 + CAST(doc_id % 6 AS INT))] AS toks
         |  FROM documents),
         |  cnt AS (SELECT w, count(*)::BIGINT AS n FROM
         |    (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |     FROM documents) GROUP BY w),
         |  vocab AS (SELECT w, n FROM cnt ORDER BY n DESC, w LIMIT 16),
         |  vl AS (SELECT list(w ORDER BY n DESC, w) AS vw FROM vocab),
         |  ids AS (SELECT doc_id,
         |    list_concat(list_concat([1::BIGINT],
         |      list_transform(t.toks, w -> CASE WHEN list_position(vl.vw, w) > 0
         |        THEN CAST(3 + list_position(vl.vw, w) AS BIGINT)
         |        ELSE CAST(20 + ${P.duckHash60("w")} % 64 AS BIGINT) END)),
         |      [2::BIGINT]) AS ids
         |  FROM t CROSS JOIN vl),
         |  bkt AS (SELECT doc_id, ids, CAST(len(ids) AS BIGINT) AS seq_len,
         |    CAST(len(ids) // 3 AS BIGINT) AS bucket FROM ids),
         |  win AS (SELECT doc_id, ids, seq_len, bucket,
         |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM bkt),
         |  wb AS (SELECT doc_id, ids, seq_len, bucket,
         |    CAST(FLOOR((rn-1)/4.0) AS BIGINT) AS wid FROM win),
         |  pb AS (SELECT doc_id, ids, seq_len, bucket, wid,
         |    CAST(max(seq_len) OVER (PARTITION BY bucket, wid) AS BIGINT) AS batch_len FROM wb)
         |SELECT doc_id, bucket, wid, seq_len, batch_len,
         |  u.pos AS pos, u.tok_id AS tok_id, u.is_pad AS is_pad FROM (
         |  SELECT doc_id, bucket, wid, seq_len, batch_len,
         |    unnest(list_transform(range(1, batch_len + 1), i -> {
         |      'pos': CAST(i AS BIGINT),
         |      'tok_id': CASE WHEN i <= seq_len THEN ids[i] ELSE 0::BIGINT END,
         |      'is_pad': CAST(CASE WHEN i > seq_len THEN 1 ELSE 0 END AS BIGINT)})) AS u
         |  FROM pb)""".stripMargin) { (s, d) =>
      val t = T.documents(s, d).selectExpr(
        "doc_id",
        "slice(split(lower(text), '\\\\s+'), 1, 3 + cast(doc_id % 6 as int)) as toks")
      // the vocab table, broadcast ONCE as a frequency-sorted word array
      // (fn11's idiom): the lookup then runs inside the scan projection —
      // an explode→join→regroup lookup would pay two corpus shuffles
      val vocab = T.documents(s, d)
        .selectExpr("explode(split(lower(text), '\\\\s+')) as w")
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(16)
        .agg(expr("array_sort(collect_list(struct(n, w)), " +
          "(a, b) -> case when a.n > b.n then -1 when a.n < b.n then 1 " +
          "when a.w < b.w then -1 when a.w > b.w then 1 else 0 end)")
          .as("vsorted"))
        .selectExpr("transform(vsorted, y -> y.w) as vw")
      t.crossJoin(broadcast(vocab))
        .withColumn("ids", expr(
          "concat(array(1L), transform(toks, w -> " +
            "case when array_position(vw, w) > 0 " +
            "then 3 + array_position(vw, w) " +
            s"else 20 + ${P.hash60("w")} % 64 end), array(2L))"))
        .withColumn("seq_len", expr("cast(size(ids) as bigint)"))
        .withColumn("bucket", expr("seq_len div 3"))
        .withColumn("rn",
          row_number().over(Window.partitionBy("bucket").orderBy("doc_id")))
        .withColumn("wid", floor((col("rn") - 1) / 4))
        .withColumn("batch_len",
          max("seq_len").over(Window.partitionBy("bucket", "wid")))
        .selectExpr("doc_id", "bucket", "wid", "seq_len", "batch_len",
          "posexplode(concat(ids, array_repeat(0L, " +
            "cast(batch_len - seq_len as int)))) as (pos0, tok_id)")
        .selectExpr("doc_id", "bucket", "wid", "seq_len", "batch_len",
          "cast(pos0 + 1 as bigint) as pos", "tok_id",
          "cast(case when pos0 + 1 > seq_len then 1 else 0 end as bigint) as is_pad")
    }
  )
}
