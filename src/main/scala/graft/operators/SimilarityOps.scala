package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float] column):
  * brute-force cosine top-k as the exactness baseline, an IVF-bucketed
  * variant as the scale path, and embedding-cosine near-duplicate pairs.
  *
  * Determinism: dot products are left-folds (`aggregate` ≡ `list_reduce`)
  * so both engines execute the identical IEEE add sequence; ordering ties
  * break on vec_id.
  *
  * Scale notes (100 TB): brute force is O(Q·N) — correct but only for
  * small Q; the IVF variant broadcast-joins the (tiny) centroid table,
  * assigns each vector to a cell in one codegen'd scan, and probes only
  * the query's cell, which is the standard distributed ANN layout.
  */
object SimilarityOps {

  private val dim = 64

  /** Left-fold dot product of two float-array columns, as double. */
  private def sparkDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0.0 as double), (acc, v) -> acc + v)"
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${dim + 1}), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (acc, v) -> acc + v)"

  /** Spark side uses the native codegen expression (graft.functions.
    * CosineSimilarity) — same ascending-index double accumulation as the
    * SQL fold, so results stay bit-identical to the DuckDB oracle while
    * fusing three folds into one allocation-free pass.
    */
  private def sparkCos(a: String, b: String): String =
    s"cosine_similarity($a, $b)"
  private def duckCos(a: String, b: String): String =
    s"${duckDot(a, b)} / sqrt(${duckDot(a, a)} * ${duckDot(b, b)})"

  val queries: Seq[Q] = Seq(

    // Brute-force cosine top-5 neighbors for query vectors vec_id < 5.
    Q(
      "ss01_topk_cosine",
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |     c AS (SELECT vec_id AS n_id, embedding AS ne FROM embeddings),
         |     s AS (SELECT q_id, n_id, ${duckCos("qe", "ne")} AS cs
         |           FROM q CROSS JOIN c WHERE q_id <> n_id)
         |SELECT q_id, CAST(rn AS BIGINT) AS rank, n_id FROM (
         |  SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, n_id) AS rn
         |  FROM s) WHERE rn <= 5""".stripMargin) { (s, d) =>
      graft.functions.CosineSimilarity.register(s)
      val e = T.embeddings(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
      broadcast(q).crossJoin(c)
        .filter(col("q_id") =!= col("n_id"))
        .selectExpr("q_id", "n_id", s"${sparkCos("qe", "ne")} as cs")
        .selectExpr(
          "q_id", "n_id",
          "cast(row_number() over (partition by q_id order by cs desc, n_id) as bigint) as rank")
        .filter(col("rank") <= 5)
        .select("q_id", "rank", "n_id")
    },

    // IVF ANN: centroid per label = member with min vec_id (deterministic
    // "medoid"); assign every vector to its nearest centroid cell; probe
    // only the query's cell for top-3.
    Q(
      "ss02_ann_ivf",
      s"""WITH cent AS (
         |  SELECT label AS cell, embedding AS ce FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |  assign AS (
         |    SELECT vec_id, cell FROM (
         |      SELECT e.vec_id, c.cell,
         |        row_number() OVER (PARTITION BY e.vec_id
         |          ORDER BY ${duckCos("e.embedding", "c.ce")} DESC, c.cell) AS rn
         |      FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
         |  q AS (SELECT e.vec_id AS q_id, e.embedding AS qe, a.cell
         |        FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id
         |        WHERE e.vec_id < 5),
         |  cand AS (SELECT q.q_id, q.qe, e.vec_id AS n_id, e.embedding AS ne
         |           FROM q JOIN assign a ON a.cell = q.cell
         |                  JOIN embeddings e ON e.vec_id = a.vec_id
         |           WHERE e.vec_id <> q.q_id)
         |SELECT q_id, CAST(rn AS BIGINT) AS rank, n_id FROM (
         |  SELECT q_id, n_id,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY ${duckCos("qe", "ne")} DESC, n_id) AS rn
         |  FROM cand) WHERE rn <= 3""".stripMargin) { (s, d) =>
      graft.functions.CosineSimilarity.register(s)
      val e = T.embeddings(s, d)
      val cent = e
        .selectExpr(
          "label as cell", "embedding as ce",
          "row_number() over (partition by label order by vec_id) as rn")
        .filter(col("rn") === 1)
        .drop("rn")
      val assign = e.crossJoin(broadcast(cent))
        .selectExpr(
          "vec_id", "cell",
          s"row_number() over (partition by vec_id order by ${sparkCos("embedding", "ce")} desc, cell) as rn")
        .filter(col("rn") === 1)
        .select("vec_id", "cell")
        .persist() // consumed twice (query cells + candidate cells)
      val q = e.filter(col("vec_id") < 5)
        .join(assign, "vec_id")
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("cell"))
      val cand = broadcast(q)
        .join(assign.withColumnRenamed("vec_id", "n_id"), "cell")
        .join(
          e.select(col("vec_id").as("n_id"), col("embedding").as("ne")),
          Seq("n_id"))
        .filter(col("n_id") =!= col("q_id"))
      cand
        .selectExpr(
          "q_id", "n_id",
          s"cast(row_number() over (partition by q_id order by ${sparkCos("qe", "ne")} desc, n_id) as bigint) as rank")
        .filter(col("rank") <= 3)
        .select("q_id", "rank", "n_id")
    },

    // Embedding-cosine near-duplicate pairs within a candidate window
    // (same label, id distance ≤ 25) above a similarity threshold.
    //
    // Candidate generation joins on id-BLOCKS (floor(id/25), each left row
    // probes its own block and the next — the standard band join), NOT on
    // `label`: label is low-cardinality, so a label join is per-label
    // near-cartesian under skew, while the block join caps every row at
    // ≤ ~50 candidates regardless of the label distribution. The label
    // equality stays as a cheap post-join filter, so the SEMANTICS (and
    // the oracle SQL) are unchanged — only the plan is skew-proof.
    Q(
      "ss03_embed_neardup",
      s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |FROM e a JOIN e b ON a.label = b.label
         |  AND a.vec_id < b.vec_id AND b.vec_id - a.vec_id <= 25
         |WHERE ${duckCos("a.embedding", "b.embedding")} > 0.3""".stripMargin) { (s, d) =>
      graft.functions.CosineSimilarity.register(s)
      val e = T.embeddings(s, d).select("vec_id", "label", "embedding")
      // a probes block(a) and block(a)+1; b sits in block(b). Since
      // 0 < b-a <= 25 implies block(b) ∈ {block(a), block(a)+1}, each
      // qualifying pair matches on exactly one block key (no dup pairs).
      val a = e.toDF("a_id", "la", "ea")
        .withColumn("blk", explode(expr("array(a_id div 25, a_id div 25 + 1)")))
      val b = e.toDF("b_id", "lb", "eb")
        .withColumn("blk", expr("b_id div 25"))
      a.join(b, Seq("blk"))
        .filter(col("la") === col("lb"))
        .filter(col("a_id") < col("b_id") && col("b_id") - col("a_id") <= 25)
        .filter(expr(s"${sparkCos("ea", "eb")} > 0.3"))
        .select("a_id", "b_id")
    },

    // Grouped vector centroids (the IVF training step / per-class mean):
    // per label, exact decimal-summed centroid components at probe dims
    // 1/16/32/64 plus the member count. Decimal sums are order-insensitive
    // so the aggregation is hash-exact under ANY partitioning — the rule
    // every distributed float aggregation here follows. No explode: one
    // codegen'd scan, partial aggregation map-side.
    Q(
      "ss04_label_centroids", {
        def dim(i: Int) =
          s"CAST(SUM(CAST(embedding[$i]::DOUBLE AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS c$i"
        s"""SELECT label, count(*) AS n, ${dim(1)}, ${dim(16)}, ${dim(32)}, ${dim(64)}
           |FROM embeddings GROUP BY label""".stripMargin
      }) { (s, d) =>
      def dim(i: Int) =
        s"cast(sum(cast(cast(element_at(embedding, $i) as double) as decimal(28,8))) as double) / count(*) as c$i"
      T.embeddings(s, d)
        .groupBy("label")
        .agg(
          count(lit(1)).as("n"),
          expr(dim(1)).as("c1"),
          expr(dim(16)).as("c16"),
          expr(dim(32)).as("c32"),
          expr(dim(64)).as("c64"))
    },

    // IVF ANN with nprobe=2: like ss02 but each query probes its TWO
    // nearest cells — the standard recall knob (nprobe) of inverted-file
    // search. Database vectors still live in exactly one cell (rn = 1),
    // so the two probed cells are disjoint and candidates need no dedup.
    // One scored cross-join with the broadcast centroids feeds BOTH the
    // cell assignment and the query probe list (persisted, consumed twice).
    Q(
      "ss05_ann_nprobe2",
      s"""WITH cent AS (
         |  SELECT label AS cell, embedding AS ce FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |  scored AS (
         |    SELECT e.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.embedding", "c.ce")} DESC, c.cell) AS rn
         |    FROM embeddings e CROSS JOIN cent c),
         |  assign AS (SELECT vec_id, cell FROM scored WHERE rn = 1),
         |  qc AS (SELECT vec_id AS q_id, cell FROM scored
         |         WHERE vec_id < 5 AND rn <= 2),
         |  q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
         |        WHERE vec_id < 5),
         |  cand AS (SELECT q.q_id, q.qe, e.vec_id AS n_id, e.embedding AS ne
         |           FROM q JOIN qc ON qc.q_id = q.q_id
         |                  JOIN assign a ON a.cell = qc.cell
         |                  JOIN embeddings e ON e.vec_id = a.vec_id
         |           WHERE e.vec_id <> q.q_id)
         |SELECT q_id, CAST(rn AS BIGINT) AS rank, n_id FROM (
         |  SELECT q_id, n_id,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY ${duckCos("qe", "ne")} DESC, n_id) AS rn
         |  FROM cand) WHERE rn <= 3""".stripMargin) { (s, d) =>
      graft.functions.CosineSimilarity.register(s)
      val e = T.embeddings(s, d)
      val cent = e
        .selectExpr(
          "label as cell", "embedding as ce",
          "row_number() over (partition by label order by vec_id) as rn")
        .filter(col("rn") === 1)
        .drop("rn")
      val scored = e.crossJoin(broadcast(cent))
        .selectExpr(
          "vec_id", "cell",
          s"row_number() over (partition by vec_id order by ${sparkCos("embedding", "ce")} desc, cell) as rn")
        .persist() // consumed twice (cell assignment + query probe list)
      val assign = scored.filter(col("rn") === 1).select("vec_id", "cell")
      val qc = scored.filter(col("vec_id") < 5 && col("rn") <= 2)
        .select(col("vec_id").as("q_id"), col("cell"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val cand = broadcast(q.join(qc, "q_id"))
        .join(assign.withColumnRenamed("vec_id", "n_id"), "cell")
        .join(
          e.select(col("vec_id").as("n_id"), col("embedding").as("ne")),
          Seq("n_id"))
        .filter(col("n_id") =!= col("q_id"))
      cand
        .selectExpr(
          "q_id", "n_id",
          s"cast(row_number() over (partition by q_id order by ${sparkCos("qe", "ne")} desc, n_id) as bigint) as rank")
        .filter(col("rank") <= 3)
        .select("q_id", "rank", "n_id")
    },

    // Int8 scalar quantization (symmetric, per-vector absmax — the
    // embedding-compression step before an ANN index ships to serving):
    // scale = 127/max|x|, q_i = floor(x_i·scale + 0.5) (round-half-up —
    // floor of an identical double is identical on both engines, unlike
    // round() whose tie mode differs). Gated at probe dims 1/16/32/64
    // plus the scale. One codegen'd scan, no shuffle.
    Q(
      "ss06_quantize_int8", {
        def qd(i: Int) =
          s"CAST(FLOOR(embedding[$i]::DOUBLE * (127.0 / mx) + 0.5) AS BIGINT) AS q$i"
        s"""WITH m AS (SELECT vec_id,  embedding,
           |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
           |  FROM embeddings)
           |SELECT vec_id, CAST(mx AS DOUBLE) AS absmax,
           |  ${qd(1)}, ${qd(16)}, ${qd(32)}, ${qd(64)}
           |FROM m WHERE mx > 0""".stripMargin
      }) { (s, d) =>
      def qs(i: Int) =
        s"cast(floor(cast(element_at(embedding, $i) as double) * (127.0 / mx) + 0.5) as bigint) as q$i"
      T.embeddings(s, d)
        .selectExpr(
          "vec_id", "embedding",
          "array_max(transform(embedding, x -> abs(cast(x as double)))) as mx")
        .filter(col("mx") > 0)
        .selectExpr(
          "vec_id", "cast(mx as double) as absmax",
          qs(1), qs(16), qs(32), qs(64))
    },

    // Per-dimension corpus statistics (mean + variance at probe dims) —
    // the whitening/normalization pass before indexing. Decimal-exact
    // sums of x and x² make the one-pass parallel aggregation
    // order-insensitive (hash-exact under any partitioning); the final
    // var = E[x²] − E[x]² arithmetic is identical IEEE on both engines.
    Q(
      "ss07_dim_stats", {
        def m(i: Int) =
          s"CAST(SUM(CAST(embedding[$i]::DOUBLE AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS mean$i"
        def v(i: Int) =
          s"CAST(SUM(CAST(embedding[$i]::DOUBLE * embedding[$i]::DOUBLE AS DECIMAL(28,8))) AS DOUBLE) / count(*) " +
            s"- (CAST(SUM(CAST(embedding[$i]::DOUBLE AS DECIMAL(28,8))) AS DOUBLE) / count(*)) " +
            s"* (CAST(SUM(CAST(embedding[$i]::DOUBLE AS DECIMAL(28,8))) AS DOUBLE) / count(*)) AS var$i"
        s"""SELECT count(*) AS n, ${m(1)}, ${v(1)}, ${m(32)}, ${v(32)}, ${m(64)}, ${v(64)}
           |FROM embeddings""".stripMargin
      }) { (s, d) =>
      def x(i: Int) = s"cast(element_at(embedding, $i) as double)"
      def m(i: Int) =
        s"cast(sum(cast(${x(i)} as decimal(28,8))) as double) / count(*) as mean$i"
      def v(i: Int) =
        s"cast(sum(cast(${x(i)} * ${x(i)} as decimal(28,8))) as double) / count(*) " +
          s"- (cast(sum(cast(${x(i)} as decimal(28,8))) as double) / count(*)) " +
          s"* (cast(sum(cast(${x(i)} as decimal(28,8))) as double) / count(*)) as var$i"
      T.embeddings(s, d)
        .selectExpr("embedding")
        .agg(
          count(lit(1)).as("n"),
          expr(m(1)).as("mean1"), expr(v(1)).as("var1"),
          expr(m(32)).as("mean32"), expr(v(32)).as("var32"),
          expr(m(64)).as("mean64"), expr(v(64)).as("var64"))
    },

    // ANN quality evaluation: recall@3 of the IVF index (ss02's plan)
    // against the exact brute-force top-3, per query — the measurement
    // that decides nlist/nprobe before an index ships. Both arms are
    // deterministic, so even the recall VALUES are oracle-exact.
    Q(
      "ss08_ivf_recall",
      s"""WITH cent AS (
         |  SELECT label AS cell, embedding AS ce FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |  assign AS (
         |    SELECT vec_id, cell FROM (
         |      SELECT e.vec_id, c.cell,
         |        row_number() OVER (PARTITION BY e.vec_id
         |          ORDER BY ${duckCos("e.embedding", "c.ce")} DESC, c.cell) AS rn
         |      FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
         |  q AS (SELECT e.vec_id AS q_id, e.embedding AS qe, a.cell
         |        FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id
         |        WHERE e.vec_id < 5),
         |  ivf AS (SELECT q_id, n_id FROM (
         |    SELECT q.q_id, e.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${duckCos("q.qe", "e.embedding")} DESC, e.vec_id) AS rn
         |    FROM q JOIN assign a ON a.cell = q.cell
         |           JOIN embeddings e ON e.vec_id = a.vec_id
         |    WHERE e.vec_id <> q.q_id) WHERE rn <= 3),
         |  exact AS (SELECT q_id, n_id FROM (
         |    SELECT q.q_id, e.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${duckCos("q.qe", "e.embedding")} DESC, e.vec_id) AS rn
         |    FROM q CROSS JOIN embeddings e
         |    WHERE e.vec_id <> q.q_id) WHERE rn <= 3)
         |SELECT x.q_id, count(i.n_id) AS n_hit,
         |  (count(i.n_id) * 100) // 3 AS recall_x100
         |FROM exact x LEFT JOIN ivf i ON i.q_id = x.q_id AND i.n_id = x.n_id
         |GROUP BY x.q_id""".stripMargin) { (s, d) =>
      graft.functions.CosineSimilarity.register(s)
      val e = T.embeddings(s, d)
      val cent = e
        .selectExpr(
          "label as cell", "embedding as ce",
          "row_number() over (partition by label order by vec_id) as rn")
        .filter(col("rn") === 1)
        .drop("rn")
      val assign = e.crossJoin(broadcast(cent))
        .selectExpr(
          "vec_id", "cell",
          s"row_number() over (partition by vec_id order by ${sparkCos("embedding", "ce")} desc, cell) as rn")
        .filter(col("rn") === 1)
        .select("vec_id", "cell")
        .persist() // query cells + candidate cells
      val q = e.filter(col("vec_id") < 5)
        .join(assign, "vec_id")
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("cell"))
      def top3(cand: org.apache.spark.sql.DataFrame) = cand
        .selectExpr(
          "q_id", "n_id",
          s"row_number() over (partition by q_id order by ${sparkCos("qe", "ne")} desc, n_id) as rn")
        .filter(col("rn") <= 3)
        .select("q_id", "n_id")
      val ivf = top3(broadcast(q)
        .join(assign.withColumnRenamed("vec_id", "n_id"), "cell")
        .join(e.select(col("vec_id").as("n_id"), col("embedding").as("ne")), Seq("n_id"))
        .filter(col("n_id") =!= col("q_id")))
      val exact = top3(broadcast(q.drop("cell"))
        .crossJoin(e.select(col("vec_id").as("n_id"), col("embedding").as("ne")))
        .filter(col("n_id") =!= col("q_id")))
      val hits = ivf.toDF("hq_id", "hit_id")
      exact.join(
        hits,
        col("q_id") === col("hq_id") && col("n_id") === col("hit_id"),
        "left")
        .groupBy("q_id")
        .agg(
          count(col("hit_id")).as("n_hit"),
          expr("(count(hit_id) * 100) div 3").as("recall_x100"))
    }
  )
}
