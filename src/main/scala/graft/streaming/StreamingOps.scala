package graft.streaming

import graft.{Portable => P, Q, Tables => T}
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` table. The queries here are the
  * *batch* renderings (oracle-checkable); StreamRunner exercises the same
  * aggregations through a genuine Structured Streaming query (readStream →
  * watermark → windowed agg → memory sink), tested in StreamingSpec.
  */
object StreamingOps {

  val queries: Seq[Q] = Seq(

    // Tumbling 1-hour event-time window aggregation.
    Q(
      "st01_window_agg",
      s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start_s, event_type,
         |  count(*) AS n, ${P.duckDsum("value")} AS v
         |FROM events GROUP BY win_start_s, event_type""".stripMargin) { (s, d) =>
      // epoch seconds instead of a raw timestamp column: engines disagree on
      // tz-awareness metadata in parquet, integers hash identically.
      T.events(s, d)
        .groupBy(
          unix_seconds(date_trunc("hour", col("ts"))).as("win_start_s"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), expr(P.dsum("value")).as("v"))
    },

    // Sessionization: per-user session count with a 30-minute inactivity
    // gap (lag over event time; exact microsecond arithmetic both engines).
    Q(
      "st02_sessionize",
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) -
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(1 + count(CASE WHEN gap_us > 1800000000 THEN 1 END) AS BIGINT) AS n_sessions
        |FROM g GROUP BY user_id""".stripMargin) { (s, d) =>
      T.events(s, d)
        .selectExpr(
          "user_id",
          "unix_micros(ts) - lag(unix_micros(ts)) over " +
            "(partition by user_id order by ts, event_id) as gap_us")
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          (lit(1) + count(when(col("gap_us") > 1800000000L, 1))).cast("long").as("n_sessions"))
    }
  )
}
