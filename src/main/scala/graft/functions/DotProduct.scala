package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: inner product of two numeric vectors
  * (`array<float>` or `array<double>` on either side).
  *
  * The composable form — `aggregate(zip_with(a, b, ...), 0.0, ...)` —
  * materializes an intermediate product array per row and evaluates the
  * fold interpreted (higher-order functions sit outside whole-stage
  * codegen); this expression is one allocation-free loop with full
  * `doGenCode` support, so the SRP sign-bit scan (ss10) and exact
  * MIPS arms (ss09) stay inside the codegen'd stage.
  *
  * Determinism contract (same as CosineSimilarity): accumulates in double
  * over ascending indices — the exact IEEE add sequence of the SQL
  * left-fold rendering and of DuckDB's `list_reduce`, so results are
  * bit-identical to the oracle formulation. Mixed element types are
  * widened per element (`(double) x`), matching `cast(x as double)` in
  * the fold.
  */
case class DotProduct(left: Expression, right: Expression)
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
        s"dot_product expects (array<float|double>, array<float|double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // zip_with pads the shorter array with NULLs and a NULL element
    // nulls the fold — mirror that exactly instead of silently dotting
    // the common prefix (the bit-identical-to-oracle contract)
    if (x.numElements() != y.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      def get(arr: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += (${get(a, isFloat(left))}) * (${get(b, isFloat(right))});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level API (Spark 4 classic Column↔Expression bridge). */
  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(DotProduct(expression(a), expression(b)))
  }

  /** Register `dot_product` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    SqlRegistry.registerOnce(spark, "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)))
}
