package graft.pipeline

import java.nio.file.Paths
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Schemas, TableStore}
import graft.ops.{Merge, Scd2, SnapshotCdc}
import graft.sources.Stage

/** The full SCD Type-2 pipeline — the Spark re-expression of the
  * reference's five-task DAG (`SCD-Automation.sql:34-102`; SURVEY.md §3).
  *
  * One [[runCycle]] call is one DAG tick:
  * {{{
  *   task1  TRUNCATE raw                (SCD-Automation.sql:34-38)
  *   task2  COPY stage → raw, PURGE     (SCD-Automation.sql:43-49)
  *   task3  MERGE raw → landing         (SCD-Automation.sql:53-74)   [J1]
  *   task4  MERGE stream → staging      (SCD-Automation.sql:79-93)   [J2]
  *   task5  INSERT OVERWRITE master     (SCD-Automation.sql:97-102)  [D4]
  * }}}
  * plus a run-log append (our TASK_HISTORY, `SCD-Automation.sql:116,147`).
  *
  * The driver program '''is''' the DAG (SURVEY.md §2.7 W3): the five tasks
  * are sequential statements here; Snowflake's AFTER-chaining is Scala
  * statement order. Cron scheduling lives in [[ScdStream]]. The
  * reference's resume-children-before-root ordering
  * (`SCD-Automation.sql:108-114`) collapses into `ScdStream.start()`: with
  * the five tasks expressed as one driver function there is no window in
  * which a resumed root could tick before its children are resumed.
  *
  * Atomicity: every table version is staged first (plain immutable parquet
  * writes), then ONE [[TableStore.commit]] flips raw, landing, staging,
  * master, the CDC snapshot, and the run log together. A crash anywhere
  * before the commit leaves the previous cycle fully intact and the stream
  * unconsumed — the reference's advance-on-consume contract
  * (`SCD-Automation.sql:142`) with no partial-cycle window.
  *
  * All rows touched in a cycle share the single `batchTime`
  * (SURVEY.md §4b.3); tests inject it, production passes `now`.
  */
class ScdPipeline(
    val spark: SparkSession,
    val store: TableStore,
    val faithful: Boolean = true,
    val config: ScdConfig = ScdConfig.supplier) {

  private val Raw = config.table("raw")
  private val Landing = config.table("landing")
  private val Staging = config.table("staging")
  private val Master = config.table("master")
  private val CdcSnapshot = config.table("landing__cdc_snapshot")
  private val RunLog = s"${config.prefix}_run_log"
  private val LoadHistory = s"${config.prefix}_load_history"

  private val stagingSchema = Schemas.scd2(config.baseSchema)

  private val cdcStream =
    new SnapshotCdc(store, CdcSnapshot, config.businessKeys, config.baseSchema,
      buckets = config.snapshotBuckets)

  /** Landing and the CDC snapshot share one layout: bucketed by business
    * key when [[ScdConfig.snapshotBuckets]] is set, so the per-cycle diff
    * joins co-partitioned scans with no Exchange. */
  private def stageLanding(df: DataFrame): String =
    config.snapshotBuckets match {
      case Some(n) => store.stageBucketed(Landing, df, config.businessKeys, n)
      case None    => store.stage(Landing, df)
    }

  /** Enforce [[ScdConfig.duplicatePolicy]] on a loaded batch. */
  private def applyDuplicatePolicy(raw: DataFrame): DataFrame =
    config.duplicatePolicy match {
      case DuplicatePolicy.Error =>
        val dups = raw.groupBy(config.businessKeys.map(col): _*)
          .count().filter(col("count") > 1).limit(5)
          .collect()
        if (dups.nonEmpty) throw new IllegalArgumentException(
          "duplicate business keys in one batch (nondeterministic MERGE, " +
            s"Snowflake would raise too); first offenders: ${dups.mkString(", ")}. " +
            "Set ScdConfig.duplicatePolicy = DuplicatePolicy.KeepOne to dedupe.")
        raw
      case DuplicatePolicy.KeepOne =>
        val cols = raw.columns.toSeq
        raw.groupBy(config.businessKeys.map(col): _*)
          .agg(min(struct(cols.map(col): _*)).as("__row"))
          .select(cols.map(c => col(s"__row.$c").as(c)): _*)
    }

  /** Peek the unconsumed stream (SELECT * FROM stream,
    * `SCD-Configuration Setup.sql:127` — side-effect free). */
  def streamChanges(): DataFrame =
    cdcStream.changes(store.readOrEmpty(Landing, config.baseSchema))

  /** Of the staged files, the ones NOT yet in the committed load-history
    * ledger. An anti-join against the ledger, not a driver-side Set of
    * every file ever loaded: only the current stage listing (one cycle's
    * files) and the anti-join survivors ever reach the driver, so the
    * check stays cycle-sized even after millions of loaded files. */
  private def unloadedFiles(files: Seq[String]): Seq[String] = {
    if (files.isEmpty) return Nil
    val staged = spark.createDataFrame(
      files.map(f =>
        org.apache.spark.sql.Row(f, Paths.get(f).getFileName.toString)).asJava,
      new org.apache.spark.sql.types.StructType()
        .add("path", org.apache.spark.sql.types.StringType)
        .add("file_name", org.apache.spark.sql.types.StringType))
    staged
      .join(store.readOrEmpty(LoadHistory, Schemas.loadHistory)
        .select("file_name"), Seq("file_name"), "left_anti")
      .select("path").collect().map(_.getString(0)).toSeq
  }

  /** Run one pipeline cycle over the files currently in `stage`.
    * Returns the number of rows loaded from the stage.
    *
    * COPY load-history semantics (`SCD-Configuration Setup.sql:183-185`):
    * files whose NAME is already in the per-table ledger are skipped, so a
    * re-run with `purge=false` over the same staged files loads 0 rows —
    * Snowflake's load history keyed the same way (re-PUT of the same name
    * is skipped without FORCE). The ledger row lands in the SAME atomic
    * commit as the cycle's tables: a crash before the commit re-loads the
    * file (exactly-once per file), never half-loads it. */
  def runCycle(stage: Stage, batchTime: Timestamp,
      purge: Boolean = true): Long = {
    val files = stage.list()
    val newFiles = unloadedFiles(files)
    runCycleWithBatch(Stage.readCsv(spark, config.baseSchema, newFiles),
      batchTime,
      afterCommit = () => if (purge) stage.rm(files),
      loadedFiles = newFiles.map(f => Paths.get(f).getFileName.toString))
  }

  /** Run one cycle with an already-loaded raw batch (the foreachBatch entry
    * used by [[ScdStream]]). A cycle that throws leaves the previous
    * manifest fully intact and appends a best-effort FAILED row to the run
    * log (the reference's TASK_HISTORY records failed runs too,
    * `SCD-Automation.sql:116,147`); the FAILED append is deliberately
    * OUTSIDE the atomic commit — there is no cycle commit to share. */
  def runCycleWithBatch(rawBatch: DataFrame, batchTime: Timestamp,
      afterCommit: () => Unit = () => (),
      loadedFiles: Seq[String] = Nil): Long =
    try runCycleInner(rawBatch, batchTime, afterCommit, loadedFiles)
    catch {
      case e: Throwable =>
        recordFailure(batchTime)
        throw e
    }

  /** Best-effort FAILED history row (never masks the original failure). */
  private def recordFailure(batchTime: Timestamp): Unit =
    try {
      val prevLog = store.readOrEmpty(RunLog, Schemas.runLog)
      store.overwrite(RunLog, prevLog.unionByName(logRow(prevLog, batchTime,
        rowsLoaded = null, status = "FAILED")))
    } catch { case _: Throwable => () }

  /** One run-log row; `cycle_id` = max(cycle_id)+1 from the PREVIOUS log
    * contents — a one-row driver read of a table that grows one row per
    * cycle, so it stays metadata-cheap at any data scale. (Counting the
    * on-disk version dirs instead broke monotonicity: `vacuum()` deletes
    * superseded versions, so every post-vacuum cycle re-counted to the
    * same id.) */
  private def logRow(prevLog: DataFrame, batchTime: Timestamp,
      rowsLoaded: java.lang.Long, status: String): DataFrame = {
    val maxPrev = Option(prevLog.agg(max(col("cycle_id"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(
        java.lang.Long.valueOf(maxPrev + 1L), batchTime, rowsLoaded,
        new Timestamp(System.currentTimeMillis()), status)),
      Schemas.runLog)
  }

  private def runCycleInner(rawBatch: DataFrame, batchTime: Timestamp,
      afterCommit: () => Unit, loadedFiles: Seq[String]): Long = {

    // ---- read a consistent pre-cycle snapshot (one manifest read) --------
    val landingPrev = store.readOrEmpty(Landing, config.baseSchema)
    val stagingPrev = store.readOrEmpty(Staging, stagingSchema)

    // task1+2: truncate raw + COPY INTO raw. Materialized first so the CSV
    // files can be purged after commit and downstream reads are from
    // parquet, not the half-typed CSV path.
    val rawVersion = store.stage(Raw, rawBatch)
    val rawLoaded = store.readVersion(Raw, rawVersion, config.baseSchema)
    val rowsLoaded = rawLoaded.count()
    val raw = applyDuplicatePolicy(rawLoaded)

    // task3: MERGE raw → landing (J1), null-propagating change detection.
    val landingNext = Merge.upsert(landingPrev, raw, config.businessKeys,
      compareCols = config.compareCols)
    val landingVersion = stageLanding(landingNext)
    val landingNew = store.readVersion(Landing, landingVersion, config.baseSchema)

    // the stream on landing now holds the delta since last consumption.
    // With registered aggregates the delta is consumed twice (SCD2 merge +
    // MV maintenance) — materialize it once, delta-sized, instead of
    // re-running the diff join per consumer.
    val cdc0 = cdcStream.changes(landingNew)
    val cdc =
      if (config.aggregates.isEmpty) cdc0 else cdc0.localCheckpoint(true)

    // task4: MERGE stream → staging (J2/SCD2) — consuming the stream.
    // Partitioned by current_flag: the master refresh (and most readers)
    // touch only the pruned 'Y' partition, never the closed history.
    val stagingNext = Scd2.merge(stagingPrev, cdc, batchTime,
      matchKeys = config.matchKeys, faithful = faithful)
    val stagingVersion = store.stage(Staging, stagingNext,
      partitionBy = Seq("current_flag"))
    val stagingNew = store.readVersion(Staging, stagingVersion, stagingSchema)

    // task5: INSERT OVERWRITE master = current view of staging.
    val masterVersion = store.stage(Master,
      Scd2.currentView(stagingNew, config.baseSchema.fieldNames.toSeq))

    // stream advance staged, committed together with everything else
    val (snapTable, snapVersion) = cdcStream.stageAdvance(landingNew)

    // registered materialized aggregates: refreshed by signed application
    // of the SAME consumed delta (IncrementalAgg) and committed in the
    // SAME manifest swap — the MV, the staging history, and the stream
    // offset can never disagree, and each refresh costs the delta plus
    // the group domain, never a landing rescan
    val mvUpdates = config.aggregates.map { mv =>
      val tbl = mvTable(mv)
      val prev = store.readOrEmpty(tbl, mvSchema(mv))
      tbl -> store.stage(tbl,
        graft.ops.IncrementalAgg.applyCdc(prev, cdc, mv.keys, mv.measures))
    }.toMap

    // run-log append (TASK_HISTORY stand-in)
    val prevLog = store.readOrEmpty(RunLog, Schemas.runLog)
    val logVersion = store.stage(RunLog, prevLog.unionByName(
      logRow(prevLog, batchTime, rowsLoaded, "SUCCEEDED")))

    // COPY load-history ledger: the newly loaded file names join the same
    // commit, so "loaded" and "visible in the tables" are one atomic fact
    val ledgerUpdate =
      if (loadedFiles.isEmpty) Map.empty[String, String]
      else {
        val prevLedger = store.readOrEmpty(LoadHistory, Schemas.loadHistory)
        val rows = spark.createDataFrame(
          loadedFiles.map(f => org.apache.spark.sql.Row(f, batchTime)).asJava,
          Schemas.loadHistory)
        Map(LoadHistory -> store.stage(LoadHistory, prevLedger.unionByName(rows)))
      }

    // ---- the atomic multi-table commit ----------------------------------
    store.commit(Map(
      Raw -> rawVersion,
      Landing -> landingVersion,
      Staging -> stagingVersion,
      Master -> masterVersion,
      snapTable -> snapVersion,
      RunLog -> logVersion) ++ ledgerUpdate ++ mvUpdates)

    afterCommit()
    rowsLoaded
  }

  /** The COPY load-history ledger (file name → load batch time). */
  def loadHistory: DataFrame =
    store.readOrEmpty(LoadHistory, Schemas.loadHistory)

  private def mvTable(mv: MaterializedAggregate): String =
    s"${config.prefix}_mv_${mv.name}"

  /** The MV's schema is whatever [[graft.ops.IncrementalAgg.fullAggregate]]
    * produces over the base schema — derived from an empty frame so the
    * two can never drift. */
  private def mvSchema(mv: MaterializedAggregate) =
    graft.ops.IncrementalAgg.fullAggregate(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        config.baseSchema),
      mv.keys, mv.measures).schema

  /** Read a registered materialized aggregate (empty until its first
    * cycle — the first delta is all INSERT images, so the MV initializes
    * itself from the empty frame). */
  def aggregate(name: String): DataFrame = {
    val mv = config.aggregates.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"no registered aggregate '$name'; registered: ${
          config.aggregates.map(_.name).mkString(", ")}"))
    store.readOrEmpty(mvTable(mv), mvSchema(mv))
  }

  // -- verification reads (SURVEY.md §3.3) --------------------------------

  /** Typed view of any tier for case-class consumers
    * (`pipeline.as[SupplierVersion](pipeline.staging)`). */
  def as[T: org.apache.spark.sql.Encoder](df: DataFrame): org.apache.spark.sql.Dataset[T] =
    df.as[T]

  def raw: DataFrame = store.readOrEmpty(Raw, config.baseSchema)
  def landing: DataFrame = store.readOrEmpty(Landing, config.baseSchema)
  def staging: DataFrame = store.readOrEmpty(Staging, stagingSchema)
  def master: DataFrame = store.readOrEmpty(Master, config.baseSchema)

  /** Task history, latest first (`SCD-Automation.sql:116,147` — O2). */
  def taskHistory: DataFrame =
    store.readOrEmpty(RunLog, Schemas.runLog).orderBy(col("completed_time").desc)

  /** SHOW STREAMS (`SCD-Configuration Setup.sql:60`, `SCD-Automation.sql:18`
    * — D5): the CDC streams this pipeline maintains, with the snapshot
    * version their offset sits at. */
  def showStreams(): DataFrame = {
    import spark.implicits._
    Seq((s"${Landing}_cdc", Landing, store.manifest.getOrElse(CdcSnapshot, "<unconsumed>")))
      .toDF("stream_name", "source_table", "consumed_version")
  }
}

object ScdPipeline {
  val Raw = "supplier_raw"
  val Landing = "supplier_landing"
  val Staging = "supplier_staging"
  val Master = "supplier_master"
  val RunLog = "supplier_run_log"
  val CdcSnapshot = "supplier_landing__cdc_snapshot"
}

/** Dimension parametrization: the reference pipeline is the supplier
  * dimension (`ScdConfig.supplier`), but any dimension with declared base
  * columns, business key(s), and SCD-tracked column(s) runs through the
  * same five-task cycle. */
case class ScdConfig(
    prefix: String,
    baseSchema: org.apache.spark.sql.types.StructType,
    businessKeys: Seq[String],
    trackedCols: Seq[String],
    /** columns whose change triggers a landing update (None = all
      * non-key columns, the reference behavior) */
    compareCols: Option[Seq[String]] = None,
    /** What to do when one batch carries the same business key twice.
      * [[DuplicatePolicy.Error]] (default) mirrors Snowflake's
      * nondeterministic-MERGE error; [[DuplicatePolicy.KeepOne]] keeps a
      * deterministic representative (min by full row) — duplicates left in
      * place would multiply landing rows through the merge join AND make
      * the CDC snapshot diff self-join explode. */
    duplicatePolicy: DuplicatePolicy = DuplicatePolicy.Error,
    /** When set, the landing table and its CDC snapshot are stored
      * hash-bucketed on the business key with this bucket count, making
      * the per-cycle snapshot diff exchange-free on both sides — the last
      * full shuffle in the core pipeline at 100 TB. Size so one bucket of
      * the dimension fits an executor core (e.g. 4096 for a 10 TB
      * dimension). */
    snapshotBuckets: Option[Int] = None,
    /** Materialized aggregates over the landing table, maintained
      * incrementally from each cycle's CDC delta
      * ([[graft.ops.IncrementalAgg]]) and committed atomically with the
      * cycle. Additive aggregates only (count + sums). */
    aggregates: Seq[MaterializedAggregate] = Nil) {
  require(businessKeys.nonEmpty, "businessKeys must be non-empty")
  /** The reference-style SCD match key: business key + tracked column
    * (`SCD-Automation.sql:85`). */
  def matchKeys: Seq[String] = businessKeys ++ trackedCols
  def table(suffix: String): String = s"${prefix}_$suffix"
}

object ScdConfig {
  /** The reference dimension. Bucketed snapshots are ON by default: the
    * 10-cycle soak measured the bucketed layout ~30% faster end-to-end
    * even at 20k-row local scale (the CDC diff loses both shuffles), and
    * the gap only widens with data size. Set `snapshotBuckets = None` for
    * environments without a (even in-memory) catalog. */
  val supplier: ScdConfig = ScdConfig(
    prefix = "supplier",
    baseSchema = Schemas.supplierBase,
    businessKeys = Seq("supplier_code"),
    trackedCols = Seq("supplier_state"),
    snapshotBuckets = Some(16))
}

/** A landing-table aggregate the pipeline maintains incrementally:
  * `keys` → `count(*) AS cnt` plus `sum(<m>) AS sum_<m>` per measure. */
case class MaterializedAggregate(
    name: String,
    keys: Seq[String],
    measures: Seq[String] = Nil) {
  require(name.matches("[a-zA-Z0-9_]+"), s"aggregate name must be [a-zA-Z0-9_]+: $name")
}

sealed trait DuplicatePolicy
object DuplicatePolicy {
  /** Fail the cycle — Snowflake raises on a MERGE where one target row
    * matches several source rows. */
  case object Error extends DuplicatePolicy
  /** Keep one deterministic representative per key (min by the full row —
    * arbitrary but stable across runs and engines). */
  case object KeepOne extends DuplicatePolicy
}
