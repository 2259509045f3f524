package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: SQUARED L2 distance of two numeric
  * vectors (`array<float>` or `array<double>` on either side) — the
  * distance kernel under Lloyd k-means assignment (ss15), IVF-PQ
  * residuals, and exact range search (ss16).
  *
  * The composable form — `aggregate(zip_with(a, b, (x, y) -> (x−y)²),
  * 0.0, +)` — materializes an intermediate difference array per row and
  * folds it interpreted; this is one allocation-free loop with full
  * `doGenCode`, so the range-search candidate filter stays inside the
  * codegen'd join stage, and the k-means argmin (which evaluates k of
  * these per vector inside a `transform` lambda) skips the per-centroid
  * array allocation even where HOFs force interpreted eval.
  *
  * Determinism contract (same as DotProduct/CosineSimilarity):
  * accumulates (xᵢ−yᵢ)² in double over ascending indices — the exact
  * IEEE sequence of the SQL left-fold rendering and DuckDB's
  * `list_reduce`, so results are bit-identical to the oracle
  * formulation. Mismatched lengths and null elements yield NULL,
  * mirroring zip_with's padding semantics.
  */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // nullable beyond child nullability: mismatched lengths and null
  // elements yield NULL (below), matching the zip_with fold
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_distance_sq expects (array<float|double>, array<float|double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("dv")
      def get(arr: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $dv = (${get(a, isFloat(left))}) - (${get(b, isFloat(right))});
         |    $acc += $dv * $dv;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceSq =
    copy(left = newLeft, right = newRight)
}

object L2DistanceSq {
  /** Column-level API (Spark 4 classic Column↔Expression bridge). */
  def l2DistanceSq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(L2DistanceSq(expression(a), expression(b)))
  }

  /** Register `l2_distance_sq` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    SqlRegistry.registerOnce(spark, "l2_distance_sq",
      exprs => L2DistanceSq(exprs(0), exprs(1)))
}
