package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style text-quality filtering: keep documents inside configurable
  * bands of token count, mean token length, punctuation density, and
  * stopword ratio — the composition of the tx01–tx03 signals as a single
  * codegen'd predicate (no UDF, no shuffle).
  */
object TextQuality {

  final case class Thresholds(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      minAvgTokenLen: Double = 2.0,
      maxAvgTokenLen: Double = 12.0,
      maxPunctRatio: Double = 0.2,
      minStopwordRatio: Double = 0.0)

  private val stopwords = "'the','a','of','and','to'"

  /** Boolean quality predicate over the named text column. */
  def isQuality(textCol: String, t: Thresholds = Thresholds()): Column = {
    val toks = split(lower(col(textCol)), "\\s+")
    val ntok = size(toks)
    val len = length(col(textCol))
    val punct = len - length(regexp_replace(col(textCol), "[.,;:!?]", ""))
    val stops = expr(
      s"size(filter(split(lower($textCol), '\\\\s+'), w -> w in ($stopwords)))")
    ntok.between(t.minTokens, t.maxTokens) &&
      (len.cast("double") / ntok)
        .between(t.minAvgTokenLen, t.maxAvgTokenLen) &&
      (punct.cast("double") / len) <= t.maxPunctRatio &&
      (stops.cast("double") / ntok) >= t.minStopwordRatio
  }

  /** Filter a documents frame on the quality predicate. */
  def filterQuality(df: DataFrame, textCol: String = "text",
      t: Thresholds = Thresholds()): DataFrame =
    df.filter(isQuality(textCol, t))
}

/** Dedup driver APIs — function-shaped entry points over the plans the
  * dd* queries pin (users call these; the queries carry the oracles).
  */
object Dedup {
  import graft.{Portable => P}

  /** Exact dedup on a content digest: first row (min of `keep`) per
    * distinct value of `col`. The payload never shuffles — only the
    * 60-bit digest and the keep-key move.
    */
  def exact(df: DataFrame, textCol: String, keepCol: String): DataFrame = {
    val keyed = df.withColumn("_h", expr(P.hash60(textCol)))
    val keepers = keyed.groupBy("_h")
      .agg(min(col(keepCol)).as(keepCol))
      .withColumnRenamed(keepCol, "_keep")
    keyed.join(keepers, keyed("_h") === keepers("_h") && col(keepCol) === col("_keep"))
      .drop("_h", "_keep")
  }

  /** MinHash-LSH near-dup candidate pairs over a text column (the
    * dd03/dd04 plan as a function): returns distinct (a_id, b_id) pairs
    * that collide in ANY of the b=4 (r=1) band buckets — multi-band
    * banding, P[candidate] = 1-(1-s^r)^b, the standard recall knob.
    *
    * Delegates to the exact machinery the gated dd04 query runs
    * (DedupOps.r1Bands + cappedBandPairs): same single-md5 Broder hash
    * family and the same bucket cap, so the API result equals dd04's and
    * a template flood can't make the pair output quadratic.
    */
  def nearDupCandidates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.operators.DedupOps
    DedupOps.cappedBandPairs(DedupOps.r1Bands(df, idCol, textCol))
  }

  /** Near-dup dedup CLUSTERS over a text column — the dd08 plan as a
    * function: minhash r=1 bands → capped pair edges + linear STAR edges
    * for oversized buckets (template floods cluster exactly at O(bucket)
    * cost) → min-label connected components. Returns (idCol, cluster_id);
    * keep `cluster_id = id` rows for the deduplicated corpus. Delegates
    * to the exact machinery the gated dd08 query runs.
    */
  def clusters(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.DedupOps.clusterLabels(df, idCol, textCol)

  /** Winnowing-overlap contamination candidates over a text column —
    * the tx12 plan as a function: native `winnow_fps` selection (MOSS
    * rolling-hash fingerprints, zero shuffle), then pairs sharing
    * ≥ `minShared` fingerprints with boilerplate buckets capped.
    * Returns (a_id, b_id, n_shared), a < b. Delegates to the exact
    * machinery the gated tx12 query runs.
    */
  def winnowCandidates(df: DataFrame, idCol: String, textCol: String,
      minShared: Int = 5): DataFrame =
    TextOps.winnowOverlap(
      TextOps.winnowFps(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text"))),
      minShared)

  /** Connected components over an undirected pair graph: every node gets
    * `cluster_id` = min node id in its component (nodes absent from
    * `pairs` are singletons labeling themselves). Iterative min-label
    * propagation: per round each node takes the min label among itself
    * and its neighbors; rounds = graph diameter, and each round shuffles
    * only (id, label) pairs — the keep/drop grouping stage of a near-dup
    * pipeline at scale.
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      idCol: String, aCol: String, bCol: String): DataFrame = {
    // fail FAST on non-integral ids: cast("long") on e.g. a string id
    // column yields NULL for every node, the NULL labels "converge"
    // immediately, and every downstream keep/drop decision silently
    // corrupts. String/UUID ids should be hashed to long first
    // (graft.Portable.hash60).
    val idType = nodes.schema(nodes.schema.fieldIndex(idCol)).dataType
    require(Seq("byte", "short", "int", "integer", "long", "bigint")
      .contains(idType.simpleString),
      s"connectedComponents needs an integral id column; '$idCol' is " +
        s"${idType.simpleString} — hash non-numeric ids to long first " +
        "(e.g. Portable.hash60)")
    // localCheckpoint (eager) TRUNCATES lineage each round — without it
    // round k's plan embeds round k-1's twice (self + neighbor branch),
    // i.e. exponential plan growth that OOMs the driver by ~round 15.
    // Executor-local blocks are fine for iterative temp state.
    val edges = pairs
      .select(col(aCol).as("_src"), col(bCol).as("_dst"))
      .union(pairs.select(col(bCol).as("_src"), col(aCol).as("_dst")))
      .localCheckpoint() // also cuts the (expensive) pair-derivation lineage
    // iterate ONLY over edge endpoints: in a near-dup corpus almost every
    // doc is a singleton, and carrying their (id, id) labels through
    // every propagation round would dominate the shuffle at scale.
    // Singletons re-join, labeling themselves, after convergence.
    val allNodes = nodes
      .select(col(idCol).as("_node"), col(idCol).cast("long").as("cluster_id"))
    val endpoints = edges.select(col("_src").as("_node")).distinct()
    var labels = allNodes
      .join(endpoints, "_node")
      .select("_node", "cluster_id")
      .localCheckpoint()
    // Convergence test: min-label propagation is MONOTONE (labels only
    // decrease), so the fixpoint is reached exactly when the decimal-
    // exact label sum stops changing. One map-side-combined aggregation
    // per round replaces the labels⋈labels change-count join — the agg
    // shuffles a few partial rows where the join re-shuffled the whole
    // label table. (decimal(38,0): 1e12 nodes × 1e12 max ids overflows
    // a long sum at the design scale.)
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val row = df.agg(sum(col("cluster_id").cast("decimal(38,0)")).as("s")).head()
      if (row.isNullAt(0)) java.math.BigDecimal.ZERO else row.getDecimal(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    val maxRounds = 64
    while (!converged && rounds < maxRounds) { // min-label is monotone: rounds ≈ diameter
      rounds += 1
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("_node", "_src"), "_src")
        .select(col("_dst").as("_node"), col("cluster_id"))
      val next = labels.select("_node", "cluster_id").union(viaNeighbor)
        .groupBy("_node")
        .agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = prevSum.compareTo(nextSum) == 0
      prevSum = nextSum
      labels = next
    }
    // a graph with diameter > maxRounds would exit with partial labels —
    // cluster_ids above the true component minimum. Fail loudly: silently
    // wrong keep/drop groups are worse than a crashed dedup job.
    require(converged,
      s"connectedComponents did not converge in $maxRounds rounds " +
        "(label sum still shrinking) — graph diameter exceeds the cap")
    // singletons (no edges) label themselves; LEFT ANTI keeps only them
    val singletons = allNodes.join(labels.select("_node"), Seq("_node"), "left_anti")
    labels.union(singletons)
      .withColumnRenamed("_node", idCol).select(idCol, "cluster_id")
  }
}
