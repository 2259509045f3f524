package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Genuine Structured Streaming path for the event-time analytics that
  * StreamingOps pins as batch oracles: file-source readStream → watermark →
  * tumbling-window agg → memory sink. StreamingSpec asserts the streaming
  * result equals the batch rendering — the exactly-once contract.
  *
  * At scale the same query runs against a Kafka/file stream with the
  * identical plan; watermark bounds state so the agg never grows unbounded.
  */
/** Per-user session state carried across micro-batches. */
final case class SessState(lastTsUs: Long, sessions: Long, events: Long)

object StreamRunner {

  /** Events fixture as a file-source stream with `ts` normalized to a
    * timestamp. FileStreamSource needs a directory, so a single-file
    * fixture is staged behind a symlink dir (zero-copy); the INT64-nanos
    * variant of `ts` (nanosAsLong) is converted exactly like
    * Tables.events does.
    */
  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = graft.Tables.t(spark, sfDir, "events").schema
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) src.toString
      else {
        val d = java.nio.file.Files.createTempDirectory("graft-stream-src")
        java.nio.file.Files.createSymbolicLink(d.resolve("events.parquet"), src)
        d.toString
      }
    val s0 = spark.readStream.schema(schema).format("parquet").load(streamDir)
    graft.Tables.normalizeTs(s0)
  }

  /** Stateful sessionization with flatMapGroupsWithState: the events table
    * is staged as TWO files so the file stream delivers two micro-batches
    * (time-split, oldest first) and per-user session state genuinely
    * persists across batches. 30-minute inactivity gap, exactly the batch
    * st02 semantics — StreamingSpec asserts equality.
    */
  def sessionizeStateful(spark: SparkSession, sfDir: String,
      queryName: String = "graft_sessions"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._

    // stage two time-ordered batch files
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) as ts_us", "event_id")
    val Array(minTs, maxTs) = ev.selectExpr("min(ts_us)", "max(ts_us)").head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = minTs + (maxTs - minTs) / 2
    val stage = java.nio.file.Files.createTempDirectory("graft-sess")
    def emit(name: String, cond: String): Unit = {
      val tmp = stage.resolve(name + "_tmp").toString
      ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(name + ".parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic oldest-first order
    }
    emit("batch_a", s"ts_us <= $mid")
    emit("batch_b", s"ts_us > $mid")

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)

    val updates = stream.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[(Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[SessState]) => {
          val evs = it.toSeq.sortBy(e => (e._2, e._3))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          evs.foreach { e =>
            st =
              if (st.events == 0L) SessState(e._2, 1L, 1L)
              else SessState(e._2,
                st.sessions + (if (e._2 - st.lastTsUs > 1800000000L) 1L else 0L),
                st.events + 1L)
          }
          state.update(st)
          Iterator((uid, st.sessions, st.events))
        })
      .toDF("user_id", "n_sessions", "n_events")

    val q = updates.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // last update per user = the row with the max cumulative event count
    spark.table(queryName)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("s"))
      .selectExpr("user_id", "s.n_sessions as n_sessions", "s.n_events as n_events")
  }

  /** Stateful keyed FIRST-TOUCH with mapGroupsWithState: per
    * (user, event_type), track the earliest (event-time, id) event seen
    * across micro-batches — streaming first-occurrence dedup where the
    * winner is decided by EVENT time, not arrival order (the property
    * `dropDuplicates` can't give you under replay/reordering). The
    * events table is staged as two time-split files so state genuinely
    * carries across batches; update-mode emissions only ever improve
    * (shrink) per key, so the per-key minimum over the memory sink is
    * the final state. StreamingSpec asserts equality with the batch
    * st05 rendering.
    */
  def firstTouchStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_first_touch"): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._

    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as ts_us", "event_id")
    val Array(minTs, maxTs) = ev.selectExpr("min(ts_us)", "max(ts_us)").head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = minTs + (maxTs - minTs) / 2
    val stage = java.nio.file.Files.createTempDirectory("graft-first")
    def emit(name: String, cond: String): Unit = {
      val tmp = stage.resolve(name + "_tmp").toString
      ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(name + ".parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic oldest-first order
    }
    // LATER half first: arrival order is the opposite of event-time
    // order, so the spec's equality with batch proves event-time wins
    emit("batch_b", s"ts_us > $mid")
    emit("batch_a", s"ts_us <= $mid")

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)

    val updates = stream.as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (key: (Long, String), it: Iterator[(Long, String, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) => {
          val batchMin = it.map(r => (r._3, r._4)).min
          val best = state.getOption.fold(batchMin)(s => Ordering[(Long, Long)].min(s, batchMin))
          state.update(best)
          (key._1, key._2, best._2, best._1)
        })
      .toDF("user_id", "event_type", "event_id", "ts_us")

    val q = updates.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // update-mode rows only improve per key → per-key min is final state
    spark.table(queryName)
      .groupBy("user_id", "event_type")
      .agg(min(struct(col("ts_us"), col("event_id"))).as("s"))
      .selectExpr("user_id", "event_type", "s.event_id as event_id", "s.ts_us as ts_us")
  }

  /** Streaming deduplication — the exactly-once-ingest primitive:
    * duplicate the events stream (two staged copies of the same file),
    * then `dropDuplicatesWithinWatermark` on event_id keeps state only
    * inside the watermark horizon. Returns the deduped collected rows;
    * StreamingSpec asserts equality with the batch distinct.
    */
  def dedupStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_dedup"): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir).select("event_id", "ts", "event_type")
    val stage = java.nio.file.Files.createTempDirectory("graft-dedup")
    // stage the SAME data twice → every event arrives duplicated
    ev.coalesce(1).write.mode("overwrite").parquet(stage.resolve("a_tmp").toString)
    val part = new java.io.File(stage.resolve("a_tmp").toString)
      .listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, stage.resolve("copy_a.parquet"))
    java.nio.file.Files.copy(part.toPath, stage.resolve("copy_b.parquet"))
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .where("event_id is not null")
    val deduped = stream
      .withWatermark("ts", "24 hours")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Stateful per-event running totals with flatMapGroupsWithState: the
    * streaming twin of batch st06. Per user, state is (event count,
    * cumulative value scaled to int-1e-4) carried across two time-split
    * micro-batches; every input event is emitted exactly once, enriched
    * with the totals as of that event. The money arithmetic enters the
    * typed path already quantized (`cast(value as decimal(28,4)) ×
    * 10000` as a long), so state addition is exact integer math and the
    * final `/10000.0` double equals the batch DECIMAL window sum's
    * double cast bit-for-bit. StreamingSpec asserts set equality with
    * st06 — the per-event exactly-once enrichment contract.
    */
  def runningTotalsStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_running"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._

    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) as ts_us", "event_id",
        "cast(cast(value as decimal(28,4)) * 10000 as bigint) as v_x1e4")
    val Array(minTs, maxTs) = ev.selectExpr("min(ts_us)", "max(ts_us)").head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = minTs + (maxTs - minTs) / 2
    val stage = java.nio.file.Files.createTempDirectory("graft-running")
    def emit(name: String, cond: String): Unit = {
      val tmp = stage.resolve(name + "_tmp").toString
      ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(name + ".parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic oldest-first order
    }
    emit("batch_a", s"ts_us <= $mid")
    emit("batch_b", s"ts_us > $mid")

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)

    val rows = stream.as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[(Long, Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) => {
          var (n, vx) = state.getOption.getOrElse((0L, 0L))
          val out = it.toSeq.sortBy(e => (e._2, e._3)).map { e =>
            n += 1L; vx += e._4
            (e._3, uid, e._2, n, vx / 10000.0)
          }
          state.update((n, vx))
          out.iterator
        })
      .toDF("event_id", "user_id", "ts_us", "n_so_far", "v_so_far")

    val q = rows.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // each event is emitted exactly once → the sink table IS the result
    spark.table(queryName)
  }

  /** Genuine stream-stream interval join (the st03 semantics): clicks and
    * purchases read as two watermarked streams, inner-joined on user with
    * a [cts, cts + 30 min] event-time range. The watermarks + range
    * condition let Spark bound both join-state buffers — the unbounded-
    * stream shape that matters at scale; StreamingSpec asserts the result
    * equals the batch st03 rendering.
    */
  def streamStreamJoin(spark: SparkSession, sfDir: String,
      queryName: String = "graft_ssjoin"): DataFrame = {
    def source(): DataFrame = eventsStream(spark, sfDir)
    val clicks = source()
      .where("event_type = 'click'")
      .selectExpr("event_id as click_id", "user_id as c_uid", "ts as cts")
      .withWatermark("cts", "1 hour")
    val purchases = source()
      .where("event_type = 'purchase'")
      .selectExpr("event_id as purchase_id", "user_id as p_uid", "ts as pts")
      .withWatermark("pts", "1 hour")
    val joined = clicks.join(
      purchases,
      expr("c_uid = p_uid and pts >= cts and pts <= cts + interval 30 minutes"))
      .selectExpr("click_id", "purchase_id", "c_uid as user_id")
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Stream-static enrichment join (the st04 semantics): the events
    * stream inner-joined per micro-batch against the static customer
    * dimension (broadcast — stream-static joins keep NO join state, the
    * static side is just re-planned each batch), revenue by segment in
    * complete mode. StreamingSpec asserts equality with batch st04.
    */
  def streamStaticJoin(spark: SparkSession, sfDir: String,
      queryName: String = "graft_enrich"): DataFrame = {
    val dim = graft.Tables.customer(spark, sfDir)
    val agg = eventsStream(spark, sfDir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"),
        expr(graft.Portable.dsum("value")).as("v"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Idempotent foreachBatch file sink — the production exactly-once
    * recipe for sinks without transactional support: each micro-batch
    * OVERWRITES its own `batch=<id>` directory, so replaying a batch
    * after a failure rewrites the same files instead of duplicating
    * rows. Returns the sink directory; StreamingSpec runs the stream
    * twice over the same input and asserts the row count is unchanged.
    */
  def idempotentFileSink(spark: SparkSession, sfDir: String, outDir: String,
      queryName: String = "graft_sink"): Unit = {
    val stream = eventsStream(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
      }
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Run the st01 window aggregation as a real stream over the events
    * fixture; returns the collected result as a DataFrame.
    */
  def windowedAgg(spark: SparkSession, sfDir: String, queryName: String = "graft_stream"): DataFrame = {
    val agg = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(
        unix_seconds(col("win.start")).as("win_start_s"),
        col("event_type"), col("n"), col("v"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** st07's sliding-window aggregation as a genuine stream: the REAL
    * window(ts, '1 hour', '15 minutes') generator over the watermarked
    * event stream, complete mode so every window is visible at the end.
    * StreamingSpec asserts equality with the batch st07 rendering.
    */
  def slidingWindowStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_sliding"): DataFrame = {
    val agg = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr(graft.Portable.dsum("value")).as("v"))
      .select(
        unix_seconds(col("win.start")).as("win_start_s"),
        col("event_type"), col("n"), col("v"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** st08's abandoned-click detection as a genuine watermarked
    * stream-stream LEFT OUTER interval join: a click's null-purchase
    * row may only emit once the watermark proves no matching purchase
    * can still arrive — the streaming-correctness subtlety the batch
    * anti-join hides. The fixture is staged as two time-split files so
    * the outer-join state genuinely expires across micro-batches.
    * Returns the emitted (click_id, user_id, ts_us) null-match rows.
    * Eviction needs a LATER batch to advance the watermark past
    * cts + 30 min, so the fixture is staged as THREE time-split files:
    * null rows whose click predates the second file's max event time
    * (minus join window, delay, and slack) are PROVABLY expired by the
    * time the third batch runs — StreamingSpec asserts emitted ≡ batch
    * st08 below that horizon and ⊆ batch st08 overall (state for the
    * final batch legitimately never expires at end-of-stream; a real
    * deployment's next micro-batch would flush it).
    */
  def abandonedClicksStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_abandoned"): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) as ts_us")
    val Array(minTs, maxTs) = ev.selectExpr("min(ts_us)", "max(ts_us)").head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val t1 = minTs + (maxTs - minTs) / 3
    val t2 = minTs + 2 * ((maxTs - minTs) / 3)
    val stage = java.nio.file.Files.createTempDirectory("graft-abandon")
    def emit(name: String, cond: String): Unit = {
      val tmp = stage.resolve(name + "_tmp").toString
      ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(name + ".parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic oldest-first order
    }
    emit("batch_a", s"ts_us <= $t1")
    emit("batch_b", s"ts_us > $t1 and ts_us <= $t2")
    emit("batch_c", s"ts_us > $t2")
    def source(): DataFrame = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val clicks = source()
      .where("event_type = 'click'")
      .selectExpr("event_id as click_id", "user_id as c_uid", "ts as cts")
      .withWatermark("cts", "1 second")
    val purchases = source()
      .where("event_type = 'purchase'")
      .selectExpr("event_id as purchase_id", "user_id as p_uid", "ts as pts")
      .withWatermark("pts", "1 second")
    val joined = clicks.join(
      purchases,
      expr("c_uid = p_uid and pts >= cts and pts <= cts + interval 30 minutes"),
      "left_outer")
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .filter("purchase_id is null")
      .selectExpr("click_id", "c_uid as user_id", "unix_micros(cts) as ts_us")
  }

  /** st11's at-least-once transport as a REAL stream: batch A is the
    * full event file, batch B the redelivery of every 50th event (same
    * event_id — the retry), admitted through the genuine watermarked
    * `dropDuplicatesWithinWatermark("event_id")`. Returns the admitted
    * rows; StreamingSpec asserts they are exactly st11's ledger keys
    * with first-delivery timestamps (the exactly-once ingest contract).
    */
  def dedupLedgerStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_dedup_ledger"): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "ts")
    val stage = java.nio.file.Files.createTempDirectory("graft-dedup-ledger")
    def emit(name: String, df: DataFrame): Unit = {
      val tmp = stage.resolve(name + "_tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(name + ".parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic oldest-first order
    }
    emit("batch_a", ev)
    emit("batch_b", ev.filter("event_id % 50 = 0"))
    val admitted = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .withWatermark("ts", "24 hours")
      .dropDuplicatesWithinWatermark("event_id")
    val q = admitted.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .selectExpr("event_id", "user_id", "unix_micros(ts) as ts_us")
  }

  /** st12's native session windows as a genuine streaming agg: the
    * identical `session_window(ts, '30 minutes')` plan over two
    * time-split micro-batches in APPEND mode (the only output mode
    * Spark supports for streaming session windows) — a session row
    * emits exactly once, when the watermark proves it can no longer
    * merge or extend. End-of-stream would strand every session still
    * inside the 30-minute horizon, so a third batch carries ONE
    * sentinel event 3 hours past the stream's end (user −1, the
    * operational "flush tick" a real deployment gets for free from the
    * next day's traffic); the sentinel's own never-finalized session is
    * dropped from the returned frame. StreamingSpec asserts equality
    * with batch st12.
    */
  def sessionWindowStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_session_window"): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "value", "ts", "unix_micros(ts) as ts_us")
    val Array(minTs, maxTs) = ev.selectExpr("min(ts_us)", "max(ts_us)").head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = minTs + (maxTs - minTs) / 2
    val stage = java.nio.file.Files.createTempDirectory("graft-sesswin")
    def emit(name: String, df: DataFrame): Unit = {
      val tmp = stage.resolve(name + "_tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(name + ".parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic oldest-first order
    }
    emit("batch_a", ev.filter(s"ts_us <= $mid"))
    emit("batch_b", ev.filter(s"ts_us > $mid"))
    emit("batch_c", ev.limit(1).selectExpr("cast(-1 as bigint) as user_id",
      "cast(-1 as bigint) as event_id", "cast(0.0 as double) as value",
      s"timestamp_micros(${maxTs + 3L * 3600000000L}) as ts",
      s"cast(${maxTs + 3L * 3600000000L} as bigint) as ts_us"))
    val agg = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .withWatermark("ts", "1 second")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), expr(graft.Portable.dsum("value")).as("v"))
      .selectExpr("user_id",
        "unix_seconds(sw.start) as sess_start_s",
        "unix_seconds(sw.end) as sess_end_s", "n", "v")
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName).filter("user_id >= 0")
  }

  /** q_cdc_compact's latest-wins changelog compaction as a stateful
    * stream: per (user_id, event_type), keep the record with the MAX
    * (event time, id) across micro-batches via mapGroupsWithState —
    * the streaming materialized-view maintenance a MERGE-upsert sink
    * performs. Staged NEWER half first (firstTouchStream's reversed-
    * arrival trick), so the spec's equality with the batch rendering
    * proves event-time wins over arrival order. StreamingSpec asserts
    * equality with the gated q_cdc_compact.
    */
  def cdcCompactStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_cdc_compact"): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._

    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "event_id",
        "unix_micros(ts) as ts_us", "value")
    val Array(minTs, maxTs) = ev.selectExpr("min(ts_us)", "max(ts_us)").head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = minTs + (maxTs - minTs) / 2
    val stage = java.nio.file.Files.createTempDirectory("graft-cdc")
    def emit(name: String, cond: String): Unit = {
      val tmp = stage.resolve(name + "_tmp").toString
      ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(name + ".parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic oldest-first order
    }
    // LATER half first: equality with batch proves event-time wins
    emit("batch_b", s"ts_us > $mid")
    emit("batch_a", s"ts_us <= $mid")

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)

    val updates = stream.as[(Long, String, Long, Long, Double)]
      .groupByKey(r => (r._1, r._2))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (key: (Long, String), it: Iterator[(Long, String, Long, Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long, Double)]) => {
          // latest = max (ts_us, event_id); value rides along
          val batchBest = it.map(r => (r._4, r._3, r._5)).maxBy(r => (r._1, r._2))
          val best = state.getOption.fold(batchBest) { s =>
            if (Ordering[(Long, Long)].gteq((s._1, s._2), (batchBest._1, batchBest._2)))
              s
            else batchBest
          }
          state.update(best)
          (key._1, key._2, best._2, best._1, best._3)
        })
      .toDF("user_id", "event_type", "last_event_id", "last_ts_us", "last_value")

    val q = updates.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // update-mode rows only improve per key → per-key max is final state
    spark.table(queryName)
      .groupBy("user_id", "event_type")
      .agg(max(struct(col("last_ts_us"), col("last_event_id"),
        col("last_value"))).as("s"))
      .selectExpr("user_id", "event_type", "s.last_event_id as last_event_id",
        "s.last_ts_us as last_ts_us", "s.last_value as last_value")
  }

  /** st14's windowed distinct-user accounting as a genuine stateful
    * stream: per 1-hour window key, `mapGroupsWithState` carries BOTH
    * the exact user-id set (bounded by users-per-window) and the KMV
    * k=16 minimum-hash sketch across micro-batches — the an19 merge
    * property (union → sort → keep-k is lossless) exercised INSIDE
    * streaming state, which is how a firehose tracks per-window
    * cardinality when the exact set no longer fits. StreamingSpec
    * asserts the final per-window rows equal the batch st14 rendering
    * — including the estimate, which only matches if the incremental
    * sketch is exactly the batch sketch.
    */
  def windowDistinctStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_windist"): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._

    // staged TWO-batch delivery (cdcCompactStream's trick): the KMV
    // merge across micro-batches is the point, and a single-file
    // fixture would fold everything into one batch
    val ev0 = graft.Tables.events(spark, sfDir)
      .selectExpr("unix_seconds(date_trunc('hour', ts)) as win_start_s",
        "user_id",
        s"${graft.Portable.hash60("concat('u|', cast(user_id as string))")} as uh",
        "unix_micros(ts) as ts_us")
    val Array(minTs, maxTs) = ev0.selectExpr("min(ts_us)", "max(ts_us)").head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = minTs + (maxTs - minTs) / 2
    val stage = java.nio.file.Files.createTempDirectory("graft-windist")
    def emit(name: String, cond: String): Unit = {
      val tmp = stage.resolve(name + "_tmp").toString
      ev0.filter(cond).drop("ts_us").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(name + ".parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic oldest-first order
    }
    emit("batch_a", s"ts_us <= $mid")
    emit("batch_b", s"ts_us > $mid")

    val ev = spark.readStream
      .schema(ev0.drop("ts_us").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)

    val updates = ev.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (win: Long, it: Iterator[(Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Set[Long], Seq[Long])]) => {
          val rows = it.toSeq
          val (n0, users0, kmv0) =
            state.getOption.getOrElse((0L, Set.empty[Long], Seq.empty[Long]))
          val n = n0 + rows.size
          val users = users0 ++ rows.map(_._2)
          // KMV merge: union of sketches, keep the k smallest distinct
          val kmv = (kmv0 ++ rows.map(_._3)).distinct.sorted.take(16)
          state.update((n, users, kmv))
          (win, n, users.size.toLong, kmv)
        })
      .toDF("win_start_s", "n_events", "n_users", "kmv")

    val q = updates.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // update mode re-emits a window on every batch that touches it; the
    // final state per window is the row with the largest n_events
    spark.table(queryName)
      .selectExpr("win_start_s", "n_events", "n_users", "kmv",
        "row_number() over (partition by win_start_s order by n_events desc) as rn")
      .filter(col("rn") === 1)
      .selectExpr("win_start_s", "n_events", "n_users",
        "case when n_users < 16 then n_users " +
          "else cast(cast('17293822569102704640' as decimal(38,0)) " +
          "div element_at(kmv, 16) as bigint) end as n_users_est")
  }

  /** st15's windowed value quantiles as a genuine stateful stream: per
    * 1-hour window key, `mapGroupsWithState` carries the k-element
    * hash-min quantile SAMPLE across micro-batches (merge = union → keep
    * the k hash-smallest, lossless by the an23-gated containment theorem)
    * plus the full (h, v) list — the latter exists ONLY so the twin can
    * also reproduce the batch EXACT quantiles for the equality assertion;
    * a production window keeps just the ≤ k-row sample, which is the
    * point. StreamingSpec asserts the final per-window rows equal the
    * batch rendering at the same k — including the estimates, which only
    * match if the incremental sample is exactly the batch sample. The
    * gated st15 query pins k=16; the spec runs k=4 so the sf0.001
    * fixture's ≤6-event windows overflow the sample and the merge path
    * is genuinely exercised. `reversed` feeds the newer half of the
    * stream FIRST (the st05 out-of-order pattern) — the k-min merge is
    * order-independent, so the output must be arrival-order-invariant.
    */
  def windowQuantilesStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_winquant", k: Int = 16,
      reversed: Boolean = false): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._

    val ev0 = graft.Tables.events(spark, sfDir)
      .selectExpr("unix_seconds(date_trunc('hour', ts)) as win_start_s",
        "cast(cast(value as decimal(28,4)) * 10000 as bigint) as v",
        s"${graft.Portable.hash60("concat('q|', cast(event_id as string))")} as h",
        "unix_micros(ts) as ts_us")
    val Array(minTs, maxTs) = ev0.selectExpr("min(ts_us)", "max(ts_us)").head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = minTs + (maxTs - minTs) / 2
    val stage = java.nio.file.Files.createTempDirectory("graft-winquant")
    def emit(name: String, cond: String): Unit = {
      val tmp = stage.resolve(name + "_tmp").toString
      ev0.filter(cond).drop("ts_us").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(name + ".parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic oldest-first order
    }
    if (reversed) {
      emit("batch_b", s"ts_us > $mid")
      emit("batch_a", s"ts_us <= $mid")
    } else {
      emit("batch_a", s"ts_us <= $mid")
      emit("batch_b", s"ts_us > $mid")
    }

    val ev = spark.readStream
      .schema(ev0.drop("ts_us").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)

    // positional-rank pick over rows sorted by (v, h) — ordering by the
    // within-window hash RANK (the batch's rn tiebreak) is ordering by h
    def pick(sorted: Seq[(Long, Long)], rank: Long): Long =
      sorted(rank.toInt - 1)._2
    val updates = ev.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (win: Long, it: Iterator[(Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long)], Seq[(Long, Long)])]) => {
          val rows = it.toSeq.map(r => (r._3, r._2)) // (h, v)
          val (all0, smp0) = state.getOption.getOrElse(
            (Seq.empty[(Long, Long)], Seq.empty[(Long, Long)]))
          val all = all0 ++ rows
          // the incremental sample merge under test: union → keep the
          // k hash-smallest (h is unique per event id)
          val smp = (smp0 ++ rows).sortBy(_._1).take(k)
          state.update((all, smp))
          val n = all.size.toLong
          val kk = math.min(k.toLong, n)
          val sSorted = smp.sortBy(p => (p._2, p._1))
          val aSorted = all.sortBy(p => (p._2, p._1))
          (win, n,
            pick(sSorted, (kk + 1) / 2), pick(aSorted, (n + 1) / 2),
            pick(sSorted, (9 * kk + 9) / 10), pick(aSorted, (9 * n + 9) / 10))
        })
      .toDF("win_start_s", "n_events", "est_p50_x1e4", "ex_p50_x1e4",
        "est_p90_x1e4", "ex_p90_x1e4")

    val q = updates.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // update mode re-emits a window on every batch that touches it; the
    // final state per window is the row with the largest n_events
    spark.table(queryName)
      .selectExpr("*",
        "row_number() over (partition by win_start_s order by n_events desc) as rn")
      .filter(col("rn") === 1)
      .select("win_start_s", "n_events", "est_p50_x1e4", "ex_p50_x1e4",
        "est_p90_x1e4", "ex_p90_x1e4")
  }

  /** st13's windowed top-k as a genuine stream: the watermarked
    * tumbling-window count/value agg runs INSIDE Structured Streaming
    * (complete mode — window state is the streaming part); the top-3
    * rank is applied to the result table per trigger, the standard
    * top-k-over-streams shape (rank is not an incremental aggregate —
    * it's a view over the maintained counts). StreamingSpec asserts
    * equality with the gated st13 batch rendering.
    */
  /** st16's stateful streaming SemDeDup twin: the embeddings table
    * arrives in FOUR micro-batches (batch = vec_id mod 4, staged
    * oldest-first) and a per-CELL `flatMapGroupsWithState` carries the
    * kept representatives' vectors across batches — an arriving vector
    * is admitted iff no kept rep (any earlier batch) and no lower-id
    * vector of its OWN batch clears τ, exactly
    * SimilarityOps.semDedupSequential's rule; StreamingSpec asserts
    * equality. Cell assignment is scan-local against the codebook plan
    * literal (the lloydKMeans broadcast pattern — streams can't run the
    * batch side's row_number window). Cosine in the state fold
    * replicates the native expression's arithmetic bit-for-bit
    * (ascending-index double accumulation), so admit decisions can't
    * drift from the batch plan.
    *
    * Scale: state per cell is the kept reps — the dedup product itself,
    * bounded by the k∝N cell contract (and shed to a compacted sink as
    * cells go cold in a production run); each micro-batch costs
    * |batch∩cell| × (|kept∩cell| + |batch∩cell|) comparisons per cell,
    * linear in the batch under that contract. Rows emit exactly once
    * (each vector is processed in its own micro-batch), so the memory
    * sink IS the ledger.
    */
  def semDedupStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_semdedup"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val tau = 0.3
    val e = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding")
    val cb = graft.operators.SimilarityOps.centLiteralSql(
      graft.operators.SimilarityOps.trainedCentroids(e))

    val ev0 = e.selectExpr("vec_id", "embedding",
      "cast(vec_id % 4 as int) as batch")
    val stage = java.nio.file.Files.createTempDirectory("graft-semdedup")
    def emit(b: Int): Unit = {
      val tmp = stage.resolve(s"batch_${b}_tmp").toString
      ev0.filter(col("batch") === b).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(s"batch_$b.parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic oldest-first order
    }
    (0 until 4).foreach(emit)

    // bit-exact twin of graft.functions.CosineSimilarity.nullSafeEval
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na * nb)
      if (denom == 0.0) Double.NaN else dot / denom // NaN > τ is false, like SQL NULL
    }

    val assigned = spark.readStream
      .schema(ev0.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .selectExpr("vec_id", "embedding", "batch",
        s"array_min(transform($cb, c -> struct(" +
          "-cosine_similarity(embedding, c.ce) as nc, c.cell as cell))).cell as cell")

    val updates = assigned.as[(Long, Array[Float], Int, Long)]
      .groupByKey(_._4)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (cell: Long, it: Iterator[(Long, Array[Float], Int, Long)],
         state: org.apache.spark.sql.streaming.GroupState[List[(Long, Array[Float])]]) => {
          val rows = it.toSeq.sortBy(_._1) // ascending id within the micro-batch
          var kept = state.getOption.getOrElse(Nil)
          val seen = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
          val out = rows.map { case (id, emb, b, _) =>
            // dominators: kept reps from earlier batches (any id) plus
            // ALL previously-seen rows of this batch (ids < id — `seen`
            // holds them in arrival order, kept or dropped)
            val doms = (kept.iterator ++ seen.iterator)
              .filter { case (_, ke) => cos(ke, emb) > tau }
              .map(_._1).toSeq
            seen += ((id, emb))
            if (doms.isEmpty) kept = kept :+ ((id, emb))
            (id, b, cell,
              if (doms.isEmpty) 1 else 0,
              if (doms.isEmpty) None else Some(doms.min))
          }
          state.update(kept)
          out.iterator
        })
      .toDF("vec_id", "batch", "cell", "keep_flag", "keeper")

    val q = updates.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Streaming TFRecord ingest: the q_tfrecord_roundtrip shards land as
    * a FILE STREAM (binaryFile readStream, one micro-batch per shard —
    * the daily-drop lifecycle) and each batch's records are
    * frame-verified, decoded, and folded into a running corpus
    * aggregate (complete mode). StreamingSpec asserts the final totals
    * equal the batch read of the same shards — landing a corpus
    * incrementally loses nothing vs reading it whole. Scale: the
    * arriving file is the unit of both parallelism and state growth
    * (the agg state is ONE row); an interrupted ingest resumes at the
    * next unseen file, which is exactly the file-source checkpoint
    * contract.
    */
  def tfRecordIngestStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_tfrec_ingest"): DataFrame = {
    import spark.implicits._
    import graft.sources.{TfRecords => TR}
    // stage the shards exactly like the gated query does
    val path = java.nio.file.Files.createTempDirectory("graft-tfrec-stream").toString
    TR.write(
      graft.Tables.documents(spark, sfDir).repartition(8).selectExpr(
        "cast(concat(lpad(cast(doc_id as string), 19, '0'), '|', text) as binary) as rec"),
      "rec", path)
    // binaryFile's fixed schema, stated explicitly (streaming sources
    // don't infer)
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val recs = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.tfrecord")
      .option("maxFilesPerTrigger", "1")
      .load(path)
      .select("content").as[Array[Byte]]
      .flatMap(bytes => TR.decodeAll(bytes).iterator)
      .selectExpr(
        "cast(substring(cast(value as string), 1, 19) as bigint) as doc_id",
        "substring(cast(value as string), 21) as text")
    val agg = recs.agg(
      count(lit(1)).cast("long").as("n"),
      sum("doc_id").cast("long").as("id_sum"),
      sum(length(col("text"))).cast("long").as("chars"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  def topKStream(spark: SparkSession, sfDir: String,
      queryName: String = "graft_topk"): DataFrame = {
    val agg = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), expr(graft.Portable.dsum("value")).as("v"))
      .select(
        unix_seconds(col("win.start")).as("win_start_s"),
        col("event_type"), col("n"), col("v"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .selectExpr("win_start_s", "event_type", "n", "v",
        "cast(row_number() over (partition by win_start_s " +
          "order by n desc, event_type) as bigint) as rnk")
      .filter(col("rnk") <= 3)
  }
}
