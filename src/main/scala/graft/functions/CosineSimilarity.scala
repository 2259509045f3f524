package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * The composable form — `aggregate(zip_with(a, b, ...), ...)` — allocates
  * an intermediate array and evaluates three separate folds (dot, |a|², |b|²)
  * per row; this expression fuses them into one pass with zero allocation,
  * with full whole-stage-codegen support (`doGenCode` emits the loop).
  *
  * Determinism contract: accumulates in double over ascending indices —
  * the exact IEEE add sequence of the SQL left-fold rendering, so results
  * are bit-identical to the DuckDB oracle formulation used in
  * SimilarityOps. This is the ANN hot path at scale (SURVEY §2.d
  * north-star: similarity search over 100 TB of embeddings).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched lengths / null elements → NULL, mirroring the
    // zip_with-fold rendering (never silently dot the common prefix)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na * nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double xv = (double) $a.getFloat($i);
         |    double yv = (double) $b.getFloat($i);
         |    $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($na * $nb);
         |    if ($denom == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-level API (Spark 4 classic Column↔Expression bridge). */
  def cosineSimilarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(CosineSimilarity(expression(a), expression(b)))
  }

  /** Register `cosine_similarity` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    SqlRegistry.registerOnce(spark, "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
}

/** Plan-time extraction of literal scalar arguments for SQL-registered
  * graft functions (winnow_fps' k/w, reservoir_sample's n/seed). These
  * parameters shape the expression itself, so they must be FOLDABLE,
  * DETERMINISTIC literals: a column reference would otherwise die as an
  * obscure NPE/ClassCastException inside `eval()`, and a foldable-but-
  * nondeterministic expression would be silently frozen at plan time.
  * Raised from the function builder, the error surfaces as a clear
  * analysis-time failure on the user's query.
  */
private[functions] object LiteralArg {
  import org.apache.spark.sql.catalyst.expressions.Expression
  def int(fn: String, arg: String, e: Expression): Int =
    num(fn, arg, e).intValue()
  def long(fn: String, arg: String, e: Expression): Long =
    num(fn, arg, e).longValue()
  private def num(fn: String, arg: String, e: Expression): Number = {
    if (!e.foldable || !e.deterministic)
      throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got ${e.sql}")
    // Integral dataType gate: a fractional literal (winnow_fps(text, 5.7, 4))
    // would otherwise silently truncate via Number.intValue, breaking the
    // "must be an integer literal" contract the error message promises.
    e.dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => ()
      case other =>
        throw new IllegalArgumentException(
          s"$fn: $arg must be an integer literal, got ${e.sql} of type " +
            other.simpleString)
    }
    e.eval() match {
      case n: Number => n
      case null => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got NULL (${e.sql})")
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got ${e.sql} of type " +
          e.dataType.simpleString)
    }
  }
}

/** Session-extension deployment path: sessions built with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (or `.withExtensions(new GraftExtensions)`) get graft's native
  * functions in every context — SQL, views, thrift — without a runtime
  * registry call.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("l2_distance_sq"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[L2DistanceSq].getName, "l2_distance_sq"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2DistanceSq(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fps"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WinnowFingerprints].getName, "winnow_fps"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowFingerprints(
          exprs(0),
          LiteralArg.int("winnow_fps", "k", exprs(1)),
          LiteralArg.int("winnow_fps", "w", exprs(2)))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("reservoir_sample"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ReservoirSample].getName, "reservoir_sample"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ReservoirSample(
          exprs(0),
          LiteralArg.int("reservoir_sample", "n", exprs(1)),
          if (exprs.size > 2) LiteralArg.long("reservoir_sample", "seed", exprs(2))
          else 42L)
          .toAggregateExpression()))
  }
}
