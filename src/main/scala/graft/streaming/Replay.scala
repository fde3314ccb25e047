package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Deterministic REPLAY harness for the streaming operators: feeds a
  * bounded table through a real Structured Streaming query — file
  * source, stateful transform, append-mode file sink, shared
  * checkpoint — as a sequence of stop/start cycles, then returns the
  * final sink table.
  *
  * This is the batch-equivalence pin for the streaming path: the final
  * sink must equal a plain batch query over the concatenated input —
  * which an external SQL engine can compute in closed form. What the
  * equality then verifies cross-engine: exactly-once file-source
  * progress across restarts (a re-read slice would duplicate output),
  * correct stateful semantics (watermark emission / dedup state), and
  * state recovery from the checkpoint at every restart.
  *
  * Scale note: this is a TEST/AUDIT harness for bounded corpora — the
  * slicing uses driver-planned bounded batches, deliberately NOT the
  * production ingest path (that is `readStream` straight onto the
  * source; see [[EventStreams]], [[StreamingDedup]]).
  */
object Replay {

  /** Drive `slices` through `pipeline` as one stop/start streaming cycle
    * per slice over a shared checkpoint; returns the sink path. The
    * workDir is wiped first — a partial previous attempt is never
    * reused. */
  private def runReplay(
      spark: SparkSession,
      slices: Seq[DataFrame],
      schema: StructType,
      root: java.nio.file.Path,
      pipeline: DataFrame => DataFrame): Unit = {
    deleteRecursively(root)
    java.nio.file.Files.createDirectories(root)
    val src = root.resolve("src").toString
    val ckpt = root.resolve("ckpt").toString
    val sink = root.resolve("sink").toString
    slices.foreach { slice =>
      // drop the next slice's files into the source dir, then run the
      // stream to completion — a full stop/start cycle per slice, so
      // every restart re-proves checkpoint recovery + exactly-once
      slice.coalesce(1).write.mode("append").parquet(src)
      val q = spark.readStream.schema(schema).parquet(src)
        .transform(pipeline)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
  }

  /** Replay `events` (`event_id, ts: timestamp, user_id, event_type,
    * value`) through [[EventStreams.windowedCounts]] in `nBatches`
    * stop/start cycles. Returns `(window_start_us, event_type, cnt,
    * sum_value)` — the sink table, sentinel-free, with the window start
    * as epoch µs (the cross-engine timestamp convention of the event
    * oracles). With the input split into TIME-ORDERED slices no row is
    * ever late (each slice's min event time ≥ the previous slice's max),
    * so the final sink must equal a plain batch `GROUP BY` over the
    * whole input. Two far-future SENTINEL slices close the tail:
    * watermark advancement only takes effect in the micro-batch AFTER
    * the data that moved it, so sentinel-1 pushes the watermark past
    * every real window during sentinel-2's run, flushing them to the
    * sink; the sentinels' own windows are never emitted. The result is
    * built once per `workDir`, gated on a completion marker. */
  def windowedCountsReplay(
      spark: SparkSession,
      events: DataFrame,
      workDir: String,
      nBatches: Int = 3,
      windowDuration: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame = {
    val root = java.nio.file.Paths.get(workDir)
    val done = root.resolve("_REPLAY_DONE")
    val sink = root.resolve("sink").toString
    if (!java.nio.file.Files.exists(done)) {
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
      val ev = events.select(cols.map(col): _*)

      // time-ordered slices (no late rows by construction — see scaladoc)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))
      val sliced = ev.withColumn("__slice",
        ntile(nBatches).over(w)).localCheckpoint(true)
      // sentinels: one event each at max(ts)+1d and +2d; their windows
      // are filtered out of the result (and in fact never emit)
      def sentinel(days: Int): DataFrame =
        ev.agg(max(col("ts")).as("m"))
          .select(lit(-1L).as("event_id"),
            (col("m") + expr(s"INTERVAL $days DAYS")).as("ts"),
            lit(-1L).as("user_id"), lit("__sentinel").as("event_type"),
            lit(0.0).as("value"))

      val slices: Seq[DataFrame] =
        (1 to nBatches).map(i =>
          sliced.filter(col("__slice") === i).drop("__slice")) ++
          Seq(sentinel(1), sentinel(2))

      runReplay(spark, slices, ev.schema, root, df =>
        EventStreams.windowedCounts(df, windowDuration, watermarkDelay))
      java.nio.file.Files.createFile(done)
    }
    spark.read.parquet(sink)
      .filter(col("event_type") =!= "__sentinel")
      .select(unix_micros(col("window_start")).as("window_start_us"),
        col("event_type"), col("cnt"), col("sum_value"))
  }

  /** Replay `events` through [[EventStreams.sessionize]] — the
    * `flatMapGroupsWithState` custom-state path — in `nBatches` stop/start
    * cycles. Time-ordered slices mean no row is late, so every closed
    * session must equal the batch gap-sessionization of the whole input
    * (the `event_sessions` recipe), which an external engine computes in
    * closed form. What the equality pins beyond the windowed-agg replay:
    * per-group state carried ACROSS restarts (a session straddling a slice
    * boundary must keep accumulating after recovery), inline gap-close
    * emission, and event-time TIMEOUT flushing — the two far-future
    * sentinels advance the watermark past every real session's
    * `last + gap`, so the tail sessions are emitted by `hasTimedOut`
    * firing, not by a next event; the watermark's one-batch lag is why
    * the second sentinel exists. Sentinel rows use `user_id = -1` and are
    * filtered from the result (the first sentinel's own session is closed
    * by the second's arrival; the second's never emits).
    *
    * `total_value` is deliberately NOT in the returned projection: the
    * state accumulates it in per-batch event order, and a float sum is
    * summation-order-dependent cross-engine. Session structure (bounds +
    * count) is the oracled surface; the value sum stays spec-covered.
    * Returns `(user_id, session_start_us, session_end_us, n_events)`;
    * built once per `workDir`, completion-marker-gated. */
  def sessionizeReplay(
      spark: SparkSession,
      events: DataFrame,
      workDir: String,
      nBatches: Int = 3,
      gapMs: Long = 3600L * 1000L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val root = java.nio.file.Paths.get(workDir)
    val done = root.resolve("_REPLAY_DONE")
    val sink = root.resolve("sink").toString
    if (!java.nio.file.Files.exists(done)) {
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
      val ev = events.select(cols.map(col): _*)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))
      val sliced = ev.withColumn("__slice",
        ntile(nBatches).over(w)).localCheckpoint(true)
      def sentinel(days: Int): DataFrame =
        ev.agg(max(col("ts")).as("m"))
          .select(lit(-1L).as("event_id"),
            (col("m") + expr(s"INTERVAL $days DAYS")).as("ts"),
            lit(-1L).as("user_id"), lit("__sentinel").as("event_type"),
            lit(0.0).as("value"))
      val slices: Seq[DataFrame] =
        (1 to nBatches).map(i =>
          sliced.filter(col("__slice") === i).drop("__slice")) ++
          Seq(sentinel(1), sentinel(2))
      runReplay(spark, slices, ev.schema, root, df => {
        import spark.implicits._
        EventStreams.sessionize(df.as[EventStreams.Event], gapMs,
          watermarkDelay).toDF()
      })
      java.nio.file.Files.createFile(done)
    }
    spark.read.parquet(sink)
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"))
  }

  /** Replay `events` through [[EventStreams.intervalJoin]] — the
    * stream-stream join path — in `nBatches` stop/start cycles. Inner
    * interval joins emit at MATCH time and evict state only when a row's
    * match window has provably passed, so with time-ordered slices (no
    * late rows) the final sink must equal the batch interval join over
    * the whole table — no sentinels needed. What the equality pins: the
    * join buffers carried ACROSS restarts (a click in slice 1 must still
    * match a purchase arriving two cycles later — rows a naive
    * per-batch join would silently drop), interval-conditional state
    * eviction never dropping a matchable row, and exactly-once source
    * progress. `joinType = "leftOuter"` additionally pins the
    * DEFERRED-NULL semantic: unmatched left rows must appear exactly once
    * with null right columns, emitted only after the watermark proved no
    * partner can arrive (two both-sided sentinel slices force that for
    * the tail). Returns `(l_id, r_id, user_id, l_ts_us, r_ts_us)`; built
    * once per `workDir`, completion-marker-gated. */
  def intervalJoinReplay(
      spark: SparkSession,
      events: DataFrame,
      workDir: String,
      nBatches: Int = 3,
      joinType: String = "inner"): DataFrame = {
    val root = java.nio.file.Paths.get(workDir)
    val done = root.resolve("_REPLAY_DONE")
    val sink = root.resolve("sink").toString
    if (!java.nio.file.Files.exists(done)) {
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
      val ev = events.select(cols.map(col): _*)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))
      val sliced = ev.withColumn("__slice",
        ntile(nBatches).over(w)).localCheckpoint(true)
      // leftOuter needs the watermark sentinels: an unmatched left row
      // emits its null only when the watermark passes l_ts + window, and
      // the watermark's one-batch lag means TWO far-future rows (one per
      // join side, so BOTH stream watermarks advance — the join watermark
      // is their min). Inner joins emit at match time and need neither.
      def sentinel(days: Int, typ: String, id: Long): DataFrame =
        ev.agg(max(col("ts")).as("m"))
          .select(lit(id).as("event_id"),
            (col("m") + expr(s"INTERVAL $days DAYS")).as("ts"),
            lit(-1L).as("user_id"), lit(typ).as("event_type"),
            lit(0.0).as("value"))
      val base = (1 to nBatches).map(i =>
        sliced.filter(col("__slice") === i).drop("__slice"))
      val slices: Seq[DataFrame] =
        if (joinType == "inner") base
        else base ++ Seq(
          sentinel(1, "click", -1L).unionByName(sentinel(1, "purchase", -2L)),
          sentinel(2, "click", -3L).unionByName(sentinel(2, "purchase", -4L)))
      runReplay(spark, slices, ev.schema, root, df =>
        EventStreams.intervalJoin(df, joinType = joinType))
      java.nio.file.Files.createFile(done)
    }
    // sentinel rows carry user_id = -1 and are filtered from the result
    spark.read.parquet(sink).filter(col("user_id") >= 0)
  }

  /** Replay a document table with RE-SENT duplicates through
    * [[StreamingDedup.exact]] across stop/start cycles: slice 1..n carry
    * disjoint id ranges of the corpus, and every later slice RE-SENDS a
    * deterministic subset of earlier rows byte-identically. The dedup
    * state must drop every resend — including ones whose original
    * arrived cycles earlier, which only works if the state survived each
    * restart — so the final sink must equal the original corpus exactly
    * (resends are identical rows, making the kept-row set deterministic
    * regardless of in-batch arrival order). `watermarkDelay` is wide so
    * no state is evicted inside the bounded replay; eviction semantics
    * at the production scale are [[StreamingDedup]]'s documented
    * watermark trade. Returns `(doc_id, len)`; built once per `workDir`,
    * completion-marker-gated. */
  def streamingDedupReplay(
      spark: SparkSession,
      docs: DataFrame,
      workDir: String,
      nBatches: Int = 3,
      resendEvery: Long = 5L): DataFrame = {
    val root = java.nio.file.Paths.get(workDir)
    val done = root.resolve("_REPLAY_DONE")
    val sink = root.resolve("sink").toString
    if (!java.nio.file.Files.exists(done)) {
      // synthetic event time, strictly increasing with doc_id (content
      // determines the kept set; the ts only feeds the watermark column)
      val d = docs.select(col("doc_id"),
          timestamp_micros(lit(1700000000000000L) +
            col("doc_id") * lit(1000000L)).as("ingest_ts"),
          col("text"))
        .localCheckpoint(true)
      val ids = d.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (lo, hi) = (ids.getLong(0), ids.getLong(1))
      val per = math.max(1L, (hi - lo + nBatches) / nBatches)
      val slices = (0 until nBatches).map { i =>
        val fresh = d.filter(col("doc_id") >= lo + i * per &&
          col("doc_id") < lo + (i + 1) * per + (if (i == nBatches - 1) 1 else 0))
        // resend a slice of EVERYTHING already sent (ids % resendEvery),
        // byte-identical — cross-restart duplicates by construction
        if (i == 0) fresh
        else fresh.unionByName(
          d.filter(col("doc_id") < lo + i * per &&
            col("doc_id") % resendEvery === 0))
      }
      runReplay(spark, slices, slices.head.schema, root, df =>
        StreamingDedup.exact(df, "text", "ingest_ts",
          watermarkDelay = "3650 days"))
      java.nio.file.Files.createFile(done)
    }
    spark.read.parquet(sink)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
  }

  /** Stream `rows` (`id`, `groupCol`, `bin`) through an EXACTLY-ONCE
    * histogram accumulator in `nBatches` stop/start cycles: each
    * micro-batch's (group, bin) partial counts land as
    * `hist/batch_<batchId>` with `overwrite` — a restart that re-runs a
    * micro-batch rewrites the same directory instead of double-counting,
    * which is the foreachBatch idempotence contract — and the
    * accumulated histogram is the sum over batch directories. This is
    * the streaming feed of the drift monitor: the baseline never
    * rescans, the stream maintains the current histogram, and the TVD
    * compare reads kilobytes. Returns `(groupCol, bin, cnt)`; built once
    * per `workDir`, gated on a completion marker. */
  def histogramReplay(
      spark: SparkSession,
      rows: DataFrame,
      groupCol: String,
      workDir: String,
      nBatches: Int = 3): DataFrame = {
    val root = java.nio.file.Paths.get(workDir)
    val done = root.resolve("_REPLAY_DONE")
    val hist = root.resolve("hist").toString
    if (!java.nio.file.Files.exists(done)) {
      deleteRecursively(root)
      java.nio.file.Files.createDirectories(root)
      val d = rows.select(col("id"), col(groupCol), col("bin"))
        .localCheckpoint(true)
      val ids = d.agg(min(col("id")), max(col("id"))).head()
      val (lo, hi) = (ids.getLong(0), ids.getLong(1))
      val per = math.max(1L, (hi - lo + nBatches) / nBatches)
      val src = root.resolve("src").toString
      val ckpt = root.resolve("ckpt").toString
      (0 until nBatches).foreach { i =>
        d.filter(col("id") >= lo + i * per &&
            col("id") < lo + (i + 1) * per +
              (if (i == nBatches - 1) 1 else 0))
          .coalesce(1).write.mode("append").parquet(src)
        val q = spark.readStream.schema(d.schema).parquet(src)
          .writeStream
          .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
            batch.groupBy(col(groupCol), col("bin"))
              .agg(count(lit(1)).as("cnt"))
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$hist/batch_$batchId")
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      java.nio.file.Files.createFile(done)
    }
    spark.read.parquet(s"$hist/batch_*")
      .groupBy(col(groupCol), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Stream `rows` (`id`, `grp`, `ts`, `v`) through an EXACTLY-ONCE
    * mergeable-OHLC accumulator in `nBatches` stop/start cycles — the
    * streaming feed of [[graft.operators.Resample.ohlc]]: each
    * micro-batch reduces to per-(series, bucket) PARTIAL rollups whose
    * open/close ride as the min/max of the full `(ts, id, v)` struct
    * (the argmin/argmax carried WITH its value, which is what makes the
    * endpoints exactly mergeable across partials — a bare first/last
    * would not merge), plus plain mergeable high/low/count/sum; each
    * partial lands `overwrite`-by-batchId (a restarted micro-batch
    * rewrites its directory instead of double-counting, the
    * foreachBatch idempotence contract of [[histogramReplay]]), and the
    * accumulated relation is the struct-min/struct-max/sum merge over
    * batch directories. The result equals the BATCH `Resample.ohlc` on
    * the same rows by construction — the oracle row reuses the batch
    * query's SQL verbatim, so the cross-restart replay is hash-checked
    * against a from-scratch recompute. Buckets floor-divide like the
    * batch operator. Returns `(grp, bucket, open, high, low, close,
    * n_events, value_sum)`; built once per `workDir`, gated on a
    * completion marker. */
  def ohlcReplay(
      spark: SparkSession,
      rows: DataFrame,
      workDir: String,
      bucketWidth: Long,
      nBatches: Int = 3): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val root = java.nio.file.Paths.get(workDir)
    val done = root.resolve("_REPLAY_DONE")
    val agg = root.resolve("ohlc").toString
    if (!java.nio.file.Files.exists(done)) {
      deleteRecursively(root)
      java.nio.file.Files.createDirectories(root)
      val d = rows.select(col("id"), col("grp"), col("ts"), col("v"))
        .localCheckpoint(true)
      // The batch slicer partitions the feed by id ranges: a NULL id would
      // fall out of every slice (silently diverging from the batch oracle,
      // which only uses id as a tiebreak), and an empty input would NPE on
      // the min/max read below. Refuse both loudly.
      require(d.filter(col("id").isNull).isEmpty,
        "ohlcReplay requires non-null ids: null ids would be dropped from every micro-batch slice")
      val ids = d.agg(min(col("id")), max(col("id"))).head()
      require(!ids.isNullAt(0), "ohlcReplay requires a non-empty input feed")
      val (lo, hi) = (ids.getLong(0), ids.getLong(1))
      val per = math.max(1L, (hi - lo + nBatches) / nBatches)
      val src = root.resolve("src").toString
      val ckpt = root.resolve("ckpt").toString
      (0 until nBatches).foreach { i =>
        d.filter(col("id") >= lo + i * per &&
            col("id") < lo + (i + 1) * per +
              (if (i == nBatches - 1) 1 else 0))
          .coalesce(1).write.mode("append").parquet(src)
        val q = spark.readStream.schema(d.schema).parquet(src)
          .writeStream
          .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
            batch
              .filter(col("ts").isNotNull && col("v").isNotNull)
              .select(col("grp"),
                expr(s"(ts - pmod(ts, ${bucketWidth}L)) div ${bucketWidth}L")
                  .as("bucket"),
                struct(col("ts"), col("id"), col("v")).as("o"),
                col("v"))
              .groupBy(col("grp"), col("bucket"))
              .agg(min(col("o")).as("omin"), max(col("o")).as("omax"),
                max(col("v")).as("high"), min(col("v")).as("low"),
                count(lit(1)).as("cnt"), sum(col("v")).as("vsum"))
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$agg/batch_$batchId")
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      java.nio.file.Files.createFile(done)
    }
    spark.read.parquet(s"$agg/batch_*")
      .groupBy(col("grp"), col("bucket"))
      .agg(min(col("omin")).as("omin"), max(col("omax")).as("omax"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        sum(col("cnt")).as("n_events"), sum(col("vsum")).as("value_sum"))
      .select(col("grp"), col("bucket"),
        col("omin.v").as("open"), col("high"), col("low"),
        col("omax.v").as("close"), col("n_events"), col("value_sum"))
  }

  /** Stream `rows` (`id`, `item`) through an EXACTLY-ONCE
    * frequent-items sketch accumulator in `nBatches` stop/start cycles:
    * each micro-batch reduces to ONE compact sketch row written
    * `overwrite`-by-batchId (a restarted batch rewrites its directory
    * instead of double-counting — the same idempotence contract as
    * [[histogramReplay]]), and the accumulated sketch is the byte-union
    * over batch directories — the mergeable-sketch-table discipline
    * applied to a live stream. The sketch's EXACT stream length
    * (ItemsSketch carries n precisely, through unions) is the
    * exactly-once witness: any re-counted batch inflates it above the
    * true row count. Returns the 1-row `(sk)` union; built once per
    * `workDir`, gated on a completion marker. */
  def topkSketchReplay(
      spark: SparkSession,
      rows: DataFrame,
      workDir: String,
      nBatches: Int = 3,
      maxMapSize: Int = 1024): DataFrame = {
    import graft.functions.FrequencySketch._
    val root = java.nio.file.Paths.get(workDir)
    val done = root.resolve("_REPLAY_DONE")
    val skDir = root.resolve("sk").toString
    if (!java.nio.file.Files.exists(done)) {
      deleteRecursively(root)
      java.nio.file.Files.createDirectories(root)
      val d = rows.select(col("id"), col("item")).localCheckpoint(true)
      val ids = d.agg(min(col("id")), max(col("id"))).head()
      val (lo, hi) = (ids.getLong(0), ids.getLong(1))
      val per = math.max(1L, (hi - lo + nBatches) / nBatches)
      val src = root.resolve("src").toString
      val ckpt = root.resolve("ckpt").toString
      (0 until nBatches).foreach { i =>
        d.filter(col("id") >= lo + i * per &&
            col("id") < lo + (i + 1) * per +
              (if (i == nBatches - 1) 1 else 0))
          .coalesce(1).write.mode("append").parquet(src)
        val q = spark.readStream.schema(d.schema).parquet(src)
          .writeStream
          .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
            batch.agg(freqAgg(col("item"), maxMapSize).as("sk"))
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$skDir/batch_$batchId")
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      java.nio.file.Files.createFile(done)
    }
    spark.read.parquet(s"$skDir/batch_*")
      .agg(freqUnionAgg(col("sk"), maxMapSize).as("sk"))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.core.Fs.deleteRecursively(p)
}
