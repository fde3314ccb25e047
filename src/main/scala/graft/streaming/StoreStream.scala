package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.core.TableStore

/** Streaming MERGE into the versioned store: a `foreachBatch` sink that
  * applies each micro-batch of updates as a merge-on-read upsert
  * ([[TableStore.upsertMoR]]) with exactly-once EFFECT across failures
  * and restarts.
  *
  * The idempotence protocol needs no transaction coordinator — it rides
  * the store's own atomicity. Each applied batch commits its batch id
  * as the version's tag, written into the version dir BEFORE the
  * one-swap manifest commit, so the tag is visible iff the upsert is.
  * On (re)delivery the sink reads the current tag as the applied
  * high-water mark and skips any batch at or below it:
  *
  *   - crash AFTER the upsert's commit but before the stream checkpoint
  *     advances → the batch is redelivered, sees its own tag, skips;
  *   - crash BEFORE the commit → the half-built version never entered a
  *     manifest (vacuum-sweepable garbage), the tag is invisible, the
  *     redelivered batch applies cleanly.
  *
  * Monotone batch ids are Structured Streaming's own contract for a
  * shared checkpoint. Maintenance DML between batches (MoR delete,
  * purge) carries the tag forward, so an OPTIMIZE pass never erases the
  * high-water mark. Single-writer-per-table is the store's documented
  * deployment assumption; this sink is that writer.
  *
  * At 100 TB this is the shape that makes streaming CDC into a huge
  * table viable at all: each micro-batch costs one key semi-join plus
  * O(batch) appended bytes and metadata (hard-linked carries move no
  * data), never a rewrite of the table — and the read side stays
  * correct through the DV anti-join until a scheduled
  * [[TableStore.purgeDeletes]] folds the tombstones in.
  */
object StoreStream {

  /** The `foreachBatch` body: apply `batch` as a tagged MoR upsert
    * unless its id is at or below the table's applied high-water mark.
    * Returns true iff the batch was applied (false = replay skipped). */
  def upsertBatch(store: TableStore, table: String, keys: Seq[String])(
      batch: DataFrame, batchId: Long): Boolean = {
    // defensive parse: a non-numeric tag (a direct upsertMoR(tag=...) by
    // some other caller on this table) is treated as "no high-water
    // mark" rather than wedging the stream with NumberFormatException on
    // every micro-batch — the sink then applies and re-tags with its own
    // numeric id. Single-writer-per-table is the documented deployment
    // assumption; this is the graceful path for violating it.
    val applied = store.versionTag(table)
      .flatMap(t => scala.util.Try(t.toLong).toOption).getOrElse(-1L)
    if (batchId <= applied) false
    else {
      store.upsertMoR(table, batch, keys, tag = Some(batchId.toString))
      true
    }
  }

  /** Deterministic replay harness (the [[Replay]] batch-equivalence
    * pattern, for the store sink): seed `table` with `base`, then drive
    * `slices` through a real file-source stream — grouped into
    * stop/start cycles of `filesPerCycle` slice files over a shared
    * checkpoint (`maxFilesPerTrigger 1`, so every slice is its own
    * micro-batch regardless of grouping), each batch applied by
    * [[upsertBatch]] — and leave the store at `storeRoot` for the
    * caller to read. The final table must equal the batch last-wins
    * merge of `base` with the concatenated slices, which an external
    * SQL engine computes in closed form; the equality witnesses
    * exactly-once effect across every restart (a re-applied slice
    * would double-tombstone nothing but would append duplicate rows —
    * any skew from the oracle is a dropped or doubled batch). Built
    * once per `workDir`, gated on a completion marker written last.
    *
    * `maintainEvery > 0` schedules OPTIMIZE inside the sink: after
    * every `maintainEvery`-th applied batch, [[TableStore.purgeDeletes]]
    * folds the accumulated tombstones in (bounding the DV anti-join
    * read tax) and [[TableStore.compactSmallFiles]] bin-packs the
    * per-batch small files (bounding file count). Both carry the
    * version tag, so the exactly-once high-water mark survives every
    * tick — this is the long-run shape of a production sink, where the
    * MoR trickle would otherwise grow one file + one DV per batch
    * forever. Maintenance cost per tick is O(work since the last
    * tick), never O(table). */
  def upsertReplay(
      spark: SparkSession,
      base: DataFrame,
      slices: Seq[DataFrame],
      keys: Seq[String],
      workDir: String,
      table: String = "t",
      maintainEvery: Int = 0,
      targetBytes: Long = 128L << 20,
      filesPerCycle: Int = 1): TableStore = {
    val root = Paths.get(workDir)
    val done = root.resolve("_replay_done")
    val store = new TableStore(root.resolve("store").toString, spark)
    if (Files.exists(done)) return store
    graft.core.Fs.deleteRecursively(root)
    Files.createDirectories(root)
    val src = root.resolve("src").toString
    val ckpt = root.resolve("ckpt").toString
    val schema: StructType = base.schema

    store.overwrite(table, base)
    slices.grouped(math.max(1, filesPerCycle)).foreach { cycle =>
      cycle.foreach(_.coalesce(1).write.mode("append").parquet(src))
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1) // one slice file = one micro-batch
        .parquet(src)
        .writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          val applied = upsertBatch(store, table, keys)(batch.toDF(), batchId)
          if (applied && maintainEvery > 0 &&
              (batchId + 1) % maintainEvery == 0) {
            store.purgeDeletes(table)
            store.compactSmallFiles(table, targetBytes)
            // between batches the sink is the store's only reader, so
            // sweeping superseded versions here is the documented-safe
            // window — keeps disk O(table), not O(table × batches)
            store.vacuum(retain = 2)
          }
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Files.createFile(done)
    store
  }

  /** The `foreachBatch` body for STREAMING INCREMENTAL CLUSTERING: fold
    * a micro-batch of documents into the stored (band table, cluster
    * assignment) pair kept by an ingest pipeline — new docs band once,
    * only collided clusters re-close
    * ([[graft.operators.Dedup.incrementalClustersDelta]]).
    *
    * Exactly-once without a coordinator, on two tables: the bands
    * upsert lands FIRST and is IDEMPOTENT by its (band, id) key (a
    * crash-retry re-tombstones and re-appends identical rows — and the
    * delta computation dedups the store∪probe union, so half-applied
    * bands never double pair counts); the assignment upsert lands LAST
    * carrying the batch-id tag, so the high-water mark is visible iff
    * the FOLD completed. A redelivered batch at or below the mark skips
    * both writes. Bands-without-assignment is the only crash state and
    * the retry converges to the same content; assignment-without-bands
    * cannot occur (commit order). */
  def clusterBatch(store: TableStore, bandsTable: String,
      assignTable: String)(batch: DataFrame, batchId: Long): Boolean = {
    val applied = store.versionTag(assignTable)
      .flatMap(t => scala.util.Try(t.toLong).toOption).getOrElse(-1L)
    if (batchId <= applied) false
    else {
      val (delta, _) = graft.operators.Dedup.incrementalClustersDelta(
        batch, store.read(bandsTable), store.read(assignTable),
        portable = true)
      val bandRows = graft.operators.Dedup.minhashBandTable(
        batch, portable = true)
      store.upsertMoR(bandsTable, bandRows, Seq("band", "id"))
      store.upsertMoR(assignTable, delta, Seq("id"),
        tag = Some(batchId.toString))
      true
    }
  }

  /** Deterministic replay harness for [[clusterBatch]] (the
    * [[upsertReplay]] pattern): seed the band table and assignment from
    * `base`, stream `slices` of documents through stop/start cycles
    * over a shared checkpoint, and leave the store for the caller. The
    * final assignment must equal the from-scratch closure over base ∪
    * slices — which an external engine recomputes in closed form, so
    * the equality witnesses exactly-once effect across every restart
    * AND the incremental fold's equivalence to full re-clustering.
    * Built once per `workDir`, gated on a completion marker. */
  def clusterReplay(
      spark: SparkSession,
      base: DataFrame,
      slices: Seq[DataFrame],
      workDir: String,
      filesPerCycle: Int = 1): TableStore = {
    val root = Paths.get(workDir)
    val done = root.resolve("_replay_done")
    val store = new TableStore(root.resolve("store").toString, spark)
    if (Files.exists(done)) return store
    graft.core.Fs.deleteRecursively(root)
    Files.createDirectories(root)
    val src = root.resolve("src").toString
    val ckpt = root.resolve("ckpt").toString
    val schema: StructType = base.schema

    val seedBands = graft.operators.Dedup.minhashBandTable(
      base, portable = true)
    store.overwrite("bands", seedBands)
    store.overwrite("assign",
      graft.operators.Dedup.clustersFromBands(store.read("bands")))
    slices.grouped(math.max(1, filesPerCycle)).foreach { cycle =>
      cycle.foreach(_.coalesce(1).write.mode("append").parquet(src))
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          clusterBatch(store, "bands", "assign")(batch.toDF(), batchId); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Files.createFile(done)
    store
  }
}
