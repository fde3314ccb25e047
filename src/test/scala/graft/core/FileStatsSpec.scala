package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** File-skipping sidecar ([[FileStats]]): pruning must only ever skip
  * files the predicate cannot match — results are pinned equal to the
  * full filtered scan in every test, and the pruning itself is pinned
  * through `DataFrame.inputFiles` (the physical scan's file list). */
class FileStatsSpec extends AnyFunSuite with Matchers with SparkSpec {

  import org.apache.spark.sql.functions._

  private def freshStore(prefix: String) = new TableStore(tmpDir(prefix), spark)

  test("range pruning on a clustered layout: fewer files, identical rows") {
    val s = spark
    import s.implicits._
    val store = freshStore("fs-range")
    val df = (0L until 10000L).toDF("id").withColumn("v", col("id") * 2)
    store.commit(Map("t" -> store.stageWithStats("t",
      df.repartitionByRange(10, col("id")).sortWithinPartitions(col("id")),
      statsCols = Seq("id"))))

    val full = store.read("t")
    full.inputFiles.length shouldBe 10

    val pruned = store.readPrunedRange("t", "id", lit(2500L), lit(3499L))
    // 1000 contiguous ids over 10 equal range partitions span ≤ 2 files
    pruned.inputFiles.length should be <= 2
    pruned.inputFiles.toSet.subsetOf(full.inputFiles.toSet) shouldBe true

    val expect = full.filter(col("id").between(2500L, 3499L))
      .collect().map(_.getLong(0)).sorted
    pruned.collect().map(_.getLong(0)).sorted shouldBe expect
    expect.length shouldBe 1000
  }

  test("bloom point lookup prunes where min/max cannot; ghosts read zero files") {
    val s = spark
    import s.implicits._
    val store = freshStore("fs-bloom")
    // key is hash-scattered: every file's [min, max] covers nearly the
    // whole domain, so range bracketing keeps everything and only the
    // bloom can prune
    val df = (0L until 20000L).toDF("id")
      .withColumn("key", pmod(xxhash64(col("id")), lit(1000000L)))
      .repartition(10)
    // bloom-ONLY evidence for key (no zone maps): the point path must
    // compose whatever the sidecar carries, not assume min/max exist
    store.commit(Map("t" -> store.stageWithStats("t", df,
      statsCols = Seq.empty, bloomCols = Seq("key"))))
    val full = store.read("t")
    full.inputFiles.length shouldBe 10

    // a key that exists: exact rows, and (with 64 Kibit / ~2k keys per
    // file) far fewer than all files read
    val probe = full.filter(col("id") === 7L).select("key").head().getLong(0)
    val hit = store.readPrunedPoint("t", "key", lit(probe))
    hit.collect().map(_.getLong(0)).sorted shouldBe
      full.filter(col("key") === probe).collect().map(_.getLong(0)).sorted
    hit.inputFiles.length should be < 10

    // a key that cannot exist (domain is [0, 1e6)): zero files planned,
    // empty result, no error — bloom false positives would only add
    // files, never rows, because the equality predicate is re-applied
    val ghost = store.readPrunedPoint("t", "key", lit(2000000L))
    ghost.inputFiles.length shouldBe 0
    ghost.count() shouldBe 0L
  }

  test("all-null column files prune for ranges; missing sidecar full-scans") {
    val s = spark
    import s.implicits._
    val store = freshStore("fs-null")
    // file 0: real values; file 1: all nulls in the stats column
    val live = (0L until 100L).toDF("id").withColumn("m", col("id"))
    val dead = (100L until 200L).toDF("id")
      .withColumn("m", lit(null).cast("long"))
    store.commit(Map("t" -> store.stageWithStats("t",
      live.coalesce(1).unionByName(dead.coalesce(1)), Seq("m"))))
    val pruned = store.readPrunedRange("t", "m", lit(10L), lit(20L))
    pruned.inputFiles.length shouldBe 1 // the all-null file can't match
    pruned.count() shouldBe 11L

    // a version staged WITHOUT stats answers the same query by full scan
    store.overwrite("u", live.unionByName(dead))
    val fallback = store.readPrunedRange("u", "m", lit(10L), lit(20L))
    fallback.count() shouldBe 11L
  }

  test("deleteRange rewrites only overlapping files; carries the rest byte-identical") {
    val s = spark
    import s.implicits._
    val store = freshStore("fs-del")
    val df = (0L until 10000L).toDF("id").withColumn("v", col("id") * 3)
    store.commit(Map("t" -> store.stageWithStats("t",
      df.repartitionByRange(10, col("id")).sortWithinPartitions(col("id")),
      statsCols = Seq("id"))))
    val oldDir = java.nio.file.Paths.get(store.currentPath("t").get)
    val oldSizes = java.nio.file.Files.list(oldDir).iterator()
    val sizesByName = scala.jdk.CollectionConverters
      .IteratorHasAsScala(oldSizes).asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> java.nio.file.Files.size(p)).toMap

    // 1000 contiguous ids live in 1-2 of the 10 range-partitioned files
    val deleted = store.deleteRange("t", "id", lit(2500L), lit(3499L))
    deleted shouldBe 1000L

    val newDir = java.nio.file.Paths.get(store.currentPath("t").get)
    newDir should not be oldDir
    // untouched files were carried byte-identical (same name, same size)
    val carried = scala.jdk.CollectionConverters
      .IteratorHasAsScala(java.nio.file.Files.list(newDir).iterator()).asScala
      .filter(p => sizesByName.contains(p.getFileName.toString)).toSeq
    carried.size should be >= 8
    carried.foreach { p =>
      java.nio.file.Files.size(p) shouldBe sizesByName(p.getFileName.toString)
    }

    // content: exactly the range is gone
    val ids = store.read("t").select("id").collect().map(_.getLong(0)).sorted
    ids.length shouldBe 9000
    ids.exists(i => i >= 2500 && i <= 3499) shouldBe false

    // the carried+fresh sidecar still prunes correctly on the new version
    val probe = store.readPrunedRange("t", "id", lit(9000L), lit(9099L))
    probe.inputFiles.length should be <= 2
    probe.count() shouldBe 100L

    // a no-match delete commits nothing
    val v = store.manifest("t")
    store.deleteRange("t", "id", lit(50000L), lit(60000L)) shouldBe 0L
    store.manifest("t") shouldBe v

    // fallback parity: a stats-less table answers the same delete
    store.overwrite("u", df)
    store.deleteRange("u", "id", lit(2500L), lit(3499L)) shouldBe 1000L
    store.read("u").count() shouldBe 9000L
  }

  test("commit history: retention-aware vacuum keeps time-travel targets, sweeps garbage") {
    val s = spark
    import s.implicits._
    val store = freshStore("fs-hist")
    store.overwrite("t", Seq(1).toDF("gen"))
    store.overwrite("t", Seq(2).toDF("gen"))
    store.overwrite("t", Seq(3).toDF("gen"))
    // a crashed write-ahead version: staged but never committed
    store.stage("t", Seq(99).toDF("gen"))

    val committed = store.committedVersions("t")
    committed.length shouldBe 3 // never includes the staged orphan
    store.versions("t").length shouldBe 4

    store.vacuum(retain = 1)
    // current + 1 superseded survive; older history and the orphan are
    // gone even though the orphan is the NEWEST directory by name
    store.versions("t").toSet shouldBe committed.takeRight(2).toSet
    val schema = store.read("t").schema
    store.readVersion("t", committed(1), schema)
      .collect().map(_.getInt(0)).toSeq shouldBe Seq(2)
    store.read("t").collect().map(_.getInt(0)).toSeq shouldBe Seq(3)

    store.vacuum() // retain 0: current only
    store.versions("t") shouldBe Seq(committed.last)
  }

  test("vacuum prunes swept versions from the time-travel index: " +
      "committedVersions only lists readable snapshots") {
    val s = spark
    import s.implicits._
    val store = freshStore("fs-histprune")
    store.overwrite("t", Seq(1).toDF("gen"))
    store.overwrite("t", Seq(2).toDF("gen"))
    store.overwrite("t", Seq(3).toDF("gen"))
    val committed = store.committedVersions("t")

    store.vacuum(retain = 1)
    // pre-fix: history kept advertising all three and readVersion on the
    // swept oldest threw path-not-found; now the index IS the readable set
    store.committedVersions("t") shouldBe committed.takeRight(2)
    val schema = store.read("t").schema
    store.committedVersions("t").foreach { v =>
      store.readVersion("t", v, schema).count() shouldBe 1L
    }

    store.vacuum()
    store.committedVersions("t") shouldBe Seq(committed.last)
    // and history stays consistent across the NEXT commit after pruning
    store.overwrite("t", Seq(4).toDF("gen"))
    store.committedVersions("t") shouldBe
      Seq(committed.last, store.manifest("t"))
  }

  test("point probe is type-safe: a literal of a different numeric type " +
      "still finds the files that contain the value") {
    val s = spark
    import s.implicits._
    val store = freshStore("fs-probetype")
    // bigint column, bloom evidence only (min/max would mask a bloom
    // false-negative by keeping files on range grounds)
    val df = (0L until 20000L).toDF("id")
      .withColumn("key", pmod(xxhash64(col("id")), lit(1000000L)))
      .repartition(8)
    store.commit(Map("t" -> store.stageWithStats("t", df,
      statsCols = Seq.empty, bloomCols = Seq("key"))))
    val full = store.read("t")
    val probe = full.filter(col("id") === 7L).select("key").head().getLong(0)

    // an INT literal: pre-fix, xxhash64(int) != xxhash64(bigint) made
    // every bloom word test false and pruned ALL files — silently empty
    val got = store.readPrunedPoint("t", "key", lit(probe.toInt))
    got.count() shouldBe full.filter(col("key") === probe).count()
    got.count() should be >= 1L

    // zone-map path too: int literal against bigint min/max
    val store2 = freshStore("fs-probetype2")
    store2.commit(Map("u" -> store2.stageWithStats("u",
      (0L until 1000L).toDF("id").repartitionByRange(4, col("id"))
        .sortWithinPartitions("id"), Seq("id"))))
    store2.readPrunedPoint("u", "id", lit(500))
      .count() shouldBe 1L

    // a literal the stored type can't hold matches nothing, consistently
    store2.readPrunedPoint("u", "id", lit("not-a-number")).count() shouldBe 0L
  }

  test("sidecar is invisible to plain reads and vacuumed with its version") {
    val s = spark
    import s.implicits._
    val store = freshStore("fs-vac")
    val v1 = store.stageWithStats("t", (0L until 50L).toDF("id"), Seq("id"))
    store.commit(Map("t" -> v1))
    // the _-prefixed sidecar never leaks into the data schema or rows
    store.read("t").columns.toSeq shouldBe Seq("id")
    store.read("t").count() shouldBe 50L

    val oldPath = store.currentPath("t").get
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(oldPath, FileStats.StatsDir)) shouldBe true

    store.overwrite("t", (0L until 10L).toDF("id"))
    store.vacuum()
    // the superseded version — sidecar included — is gone
    java.nio.file.Files.exists(java.nio.file.Paths.get(oldPath)) shouldBe false
  }
}
