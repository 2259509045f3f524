package graft.api

import graft.bench.Harness
import graft.compile.Compiler
import graft.ir.PipelineGraph
import graft.rules.Rule
import org.apache.spark.sql.SparkSession

/** A22 — grid search over pipeline variants (annotations.py:213-298):
  * expand a rule-set grid, benchmark each rewritten variant, keep the
  * argmax-rate one whose schema is unchanged (element-spec equality gate,
  * annotations.py:255-263).
  */
object GridSearch {

  final case class Variant(label: String, rules: Seq[Rule])
  final case class Outcome(label: String, graph: PipelineGraph, rate: Double,
      schemaOk: Boolean)

  def search(spark: SparkSession, g0: PipelineGraph, sfDir: String,
      variants: Seq[Variant], maxIterations: Int = 3): (Outcome, Seq[Outcome]) = {
    val base = Compiler.compile(spark, g0, sfDir).df.schema
    val outcomes = variants.map { v =>
      val g1 = graft.rules.RuleRunner.run(g0, v.rules).graph
      val ok = Compiler.compile(spark, g1, sfDir).df.schema == base
      val rate =
        if (ok) Harness.benchmark(spark, g1, sfDir, maxIterations).elementRate
        else 0.0
      Outcome(v.label, g1, rate, ok)
    }
    (outcomes.filter(_.schemaOk).maxBy(_.rate), outcomes)
  }
}

/** A23 — fake/source-only pipeline derivation (pipeline_optimizer.py:726-743):
  * a zero-filled source matching a target schema, repeated n times — the
  * reference uses it to measure downstream cost with a free source.
  * Nullability may tighten (a constant source is never null); the
  * element-spec contract compares names/types, matching the reference's
  * shape/dtype equality.
  */
object FakeSource {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  def zeros(spark: SparkSession, schema: StructType, n: Long): org.apache.spark.sql.DataFrame = {
    val cols = schema.fields.map { f =>
      val zero = f.dataType match {
        case _: StringType => lit("")
        case _: BinaryType => lit(Array.empty[Byte])
        case ArrayType(et, _) => array().cast(ArrayType(et))
        case t: NumericType => lit(0).cast(t)
        case _: BooleanType => lit(false)
        case _: TimestampType => lit(new java.sql.Timestamp(0L))
        case _: TimestampNTZType => lit(java.time.LocalDateTime.of(1970, 1, 1, 0, 0))
        case _: DateType => lit(new java.sql.Date(0L))
        case t => lit(null).cast(t)
      }
      zero.as(f.name)
    }
    spark.range(n).select(cols.toIndexedSeq: _*)
  }
}
