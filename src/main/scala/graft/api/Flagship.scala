package graft.api

import graft.compile.Compiler
import graft.ir.PipelineOp._
import graft.ir.{PipelineGraph, PipelineNode}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SURVEY §7.3 minimum end-to-end slice: a ResNet-shaped pipeline
  * (scan → map → filter → shuffle → batch(128) → take) over the lineitem
  * fixture — §2.a ops 1, 6, 7, 11, 8, 13 — expressed in the pipeline IR
  * and compiled to a DataFrame, so the driver's smoke check exercises
  * IR → compile → plan in one call. Optimizer/metrics run over the same
  * graph in PipelineSpec.
  */
object Flagship {

  /** The flagship pipeline as IR. */
  def graph: PipelineGraph = PipelineGraph(
    Seq(
      PipelineNode(0, Scan("lineitem"), Nil, parallelism = 4),
      PipelineNode(1, MapE(Seq(
        "l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice * (1 - l_discount) as revenue")), Seq(0)),
      PipelineNode(2, FilterE("revenue > 1000.0"), Seq(1)),
      PipelineNode(3, MapE(Seq(
        "l_orderkey", "l_linenumber", "l_quantity", "revenue",
        "(l_orderkey * 2654435761 + l_linenumber * 40503) % 999983 as skey")), Seq(2)),
      PipelineNode(4, Batch(
        size = 128, dropRemainder = false,
        shardExpr = "l_orderkey % 8",
        orderCols = Seq("skey", "l_orderkey", "l_linenumber", "l_quantity"),
        aggs = Seq("sum(l_quantity) as qty", "sum(revenue) as revenue")), Seq(3)),
      PipelineNode(5, Take(64, Seq("shard", "batch_id")), Seq(4))),
    sink = 5)

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Compiler.compile(spark, graph, sfDir).df
}
