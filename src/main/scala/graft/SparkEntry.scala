package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2) re-expressed
  * Spark-first; `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's hash-compare gate. Both are assembled from the per-domain
  * registries so each operator family lives next to its documentation.
  */
object SparkEntry {

  /** Every registered query, in registration order. */
  def all: Seq[Q] =
    graft.operators.PipelineOps.queries ++
      graft.operators.HeadlineQueries.queries ++
      graft.functions.FunctionOps.queries ++
      graft.functions.TextOps.queries ++
      graft.operators.DedupOps.queries ++
      graft.operators.MlDedup.queries ++
      graft.operators.SimilarityOps.queries ++
      graft.operators.SamplingOps.queries ++
      graft.operators.MultimodalOps.queries ++
      graft.streaming.StreamingOps.queries ++
      graft.operators.CurationOps.queries ++
      graft.plans.AnalysisQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the SURVEY §7.3 minimum slice through the pipeline IR compiler:
    * scan → map → filter → shuffle → batch → take.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.api.Flagship.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
