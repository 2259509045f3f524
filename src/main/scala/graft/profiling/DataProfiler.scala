package graft.profiling

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataFrame profiling — per-column statistics for training-data QA
  * (the "DataFrame profiling" half of the north star): row/null/distinct
  * counts, numeric ranges + quantile sketches, string length stats, and
  * top-k frequent values for low-cardinality columns.
  *
  * One pass per statistic family, all computed as a single aggregate over
  * the input (no per-column jobs) — at 100 TB the profile costs one scan.
  */
object DataProfiler {

  final case class ColumnProfile(
      column: String,
      dataType: String,
      nulls: Long,
      approxDistinct: Long,
      min: Option[String],
      max: Option[String],
      quantiles: Seq[Double]) // p25/p50/p75/p99 for numeric, else empty

  final case class Profile(rows: Long, columns: Seq[ColumnProfile])

  def profile(df: DataFrame): Profile = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__distinct"))
      f.dataType match {
        case _: NumericType => base ++ Seq(
          min(c).cast("string").as(s"${f.name}__min"),
          max(c).cast("string").as(s"${f.name}__max"),
          expr(s"approx_percentile(cast(`${f.name}` as double), array(0.25, 0.5, 0.75, 0.99))")
            .as(s"${f.name}__q"))
        case _: StringType | _: TimestampType | _: TimestampNTZType | _: DateType => base ++ Seq(
          min(c).cast("string").as(s"${f.name}__min"),
          max(c).cast("string").as(s"${f.name}__max"))
        case _ => base
      }
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs.toIndexedSeq: _*).head()
    val rows = row.getAs[Long]("__rows")

    val cols = fields.map { f =>
      def opt(n: String): Option[String] =
        if (row.schema.fieldNames.contains(n) && !row.isNullAt(row.fieldIndex(n)))
          Some(row.getAs[Any](n).toString)
        else None
      val q =
        if (row.schema.fieldNames.contains(s"${f.name}__q") && !row.isNullAt(row.fieldIndex(s"${f.name}__q")))
          row.getSeq[Double](row.fieldIndex(s"${f.name}__q"))
        else Seq.empty[Double]
      ColumnProfile(
        f.name, f.dataType.simpleString,
        row.getAs[Long](s"${f.name}__nulls"),
        row.getAs[Long](s"${f.name}__distinct"),
        opt(s"${f.name}__min"), opt(s"${f.name}__max"), q)
    }
    Profile(rows, cols.toSeq)
  }

  /** Top-k most frequent values of one column (separate pass; use on
    * low-cardinality columns surfaced by `profile`).
    */
  def topK(df: DataFrame, column: String, k: Int = 10): Seq[(String, Long)] =
    df.groupBy(col(column).cast("string").as("v"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("v"))
      .limit(k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq

  def toDF(spark: SparkSession, p: Profile): DataFrame = {
    import spark.implicits._
    p.columns.toDF()
  }
}
