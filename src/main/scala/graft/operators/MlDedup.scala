package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, NGram, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-pipeline near-duplicate detection: RegexTokenizer → binary
  * HashingTF → MinHashLSH, then approxSimilarityJoin — the spark.ml
  * rendering of the same shingle→minhash→band plan DedupOps builds by
  * hand. Seeded, so results are deterministic per Spark version, but the
  * hash family is engine-internal → rows-only gate (the portable
  * hand-rolled variant dd03/dd04/dd06 carries the DuckDB oracle).
  *
  * At scale this is the standard MLlib LSH deployment: the model
  * broadcasts its hash functions; approxSimilarityJoin shuffles only
  * hash buckets.
  */
object MlDedup {

  def pipeline(numFeatures: Int = 1 << 17, numHashTables: Int = 2): Pipeline = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens").setPattern("\\s+")
    // 3-gram shingles, NOT unigrams: with a small shared vocabulary every
    // document contains the globally-min-hashed token, so unigram MinHash
    // puts the whole corpus in ONE bucket and approxSimilarityJoin
    // degenerates to a single-task cartesian (observed: 12 GB one-task
    // shuffle at sf0.1). Shingle sets are diverse → buckets stay small.
    val ngram = new NGram().setN(3).setInputCol("tokens").setOutputCol("shingles")
    val tf = new HashingTF()
      .setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true) // set semantics for Jaccard
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42)
    new Pipeline().setStages(Array(tok, ngram, tf, lsh))
  }

  /** Candidate near-dup pairs under Jaccard distance ≤ `maxDistance`. */
  def nearDupPairs(docs: DataFrame, maxDistance: Double): DataFrame = {
    val model = pipeline().fit(docs)
    // materialize: approxSimilarityJoin self-joins this frame, and the
    // tokenize→shingle→TF→minhash chain would otherwise run twice.
    // Released by caller clearCache; reruns reuse the entry (CacheManager
    // dedups by plan — CacheHygieneSpec)
    val hashed = model.transform(docs).persist()
    // token-set vectors with zero set bits break MinHash; docs are non-empty
    val lshModel = model.stages.last.asInstanceOf[org.apache.spark.ml.feature.MinHashLSHModel]
    lshModel.approxSimilarityJoin(hashed, hashed, maxDistance, "dist")
      .selectExpr("datasetA.doc_id as a_id", "datasetB.doc_id as b_id", "dist")
      .filter(col("a_id") < col("b_id"))
  }

  val queries: Seq[Q] = Seq(
    // rows-only: MLlib's MinHash family isn't reproducible in DuckDB
    Q.noOracle("dd07_mllib_minhash_lsh") { (s, d) =>
      nearDupPairs(T.documents(s, d), maxDistance = 0.6)
        .select("a_id", "b_id")
    }
  )
}
