package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors: the third deletion tier of the
  * store, next to full copy-on-write ([[TableStore.deleteWhere]]) and
  * surgical file rewrite ([[TableStore.deleteRange]]).
  *
  * A DV commit touches NO data bytes: the deleted rows are recorded as
  * `(file, pos)` pairs — the data file's NAME plus the row's position
  * within it (Spark's parquet `_metadata.row_index`, stable because
  * version files are immutable) — in a one-file parquet sidecar inside
  * the version directory, and every data file is carried into the new
  * version verbatim. Deleting k rows from a 100 TB table therefore
  * costs one predicate scan plus O(k) metadata, independent of how the
  * matches scatter across files — the case where [[TableStore.deleteRange]]
  * would rewrite everything (an unclustered predicate overlaps every
  * file's zone map) and [[TableStore.deleteWhere]] would rewrite the
  * corpus. The price moves to reads: every scan of a DV'd version
  * anti-joins the sidecar (file-backed and small, so Catalyst plans a
  * broadcast-hash LEFT ANTI — no shuffle of the data side), until
  * [[TableStore.purgeDeletes]] materializes the deletions by rewriting
  * ONLY the files the DV names.
  *
  * Keying by file NAME rather than full path is what makes carries
  * free: a version's part-file names are unique (Spark UUID part
  * naming) and byte-copies preserve them, so a DV rides through any
  * number of subsequent carry commits with no path rewriting — unlike
  * the stats sidecar, whose rows embed full paths and need remapping.
  *
  * This is the deletion-vector design of the public lakehouse formats
  * (Delta Lake's deletion vectors, Iceberg v2 positional delete files),
  * reduced to its Spark-expressible core: position-keyed tombstones
  * applied by an anti-join at scan time.
  */
object DeleteVectors {

  /** Sidecar directory name inside a version dir. The leading
    * underscore hides it from parquet directory listings, so plain
    * readers of the version never see tombstones as data. */
  val DvDir = "_graft_dv"

  private def dvPath(dataDir: String) = Paths.get(dataDir, DvDir)

  /** Whether `dataDir` carries a (complete) deletion vector. */
  def exists(dataDir: String): Boolean =
    Files.exists(dvPath(dataDir).resolve("_SUCCESS"))

  /** The DV as a DataFrame `(file: string, pos: long)`, if present. */
  def read(spark: SparkSession, dataDir: String): Option[DataFrame] =
    if (exists(dataDir)) Some(spark.read.parquet(dvPath(dataDir).toString))
    else None

  /** Write `(file, pos)` tombstones as the version's DV. One file: a
    * DV is metadata — kilobytes to megabytes — and a single object
    * keeps the scan-time sidecar read one round trip. */
  def write(dv: DataFrame, dataDir: String): Unit =
    dv.select(col("file"), col("pos"))
      .coalesce(1).write.mode("overwrite").parquet(dvPath(dataDir).toString)

  /** The file-NAME component of a `_metadata.file_path` value. */
  def fileNameOf(pathCol: Column): Column =
    element_at(split(pathCol, "/"), -1)

  /** The scan plus explicit `(__dv_file, __dv_pos)` columns captured
    * from the hidden `_metadata` struct. Capture must happen directly
    * above the file scan (filters are fine, joins/projections are
    * not): metadata columns don't reliably resolve through other
    * operators, and above a join with another parquet relation
    * `_metadata` would be ambiguous anyway. */
  def withPosition(df: DataFrame): DataFrame =
    df.withColumn("__dv_file", fileNameOf(col("_metadata.file_path")))
      .withColumn("__dv_pos", col("_metadata.row_index"))

  /** Anti-join `df` (which must already carry the [[withPosition]]
    * columns) against tombstones `(file, pos)`. */
  def antiJoin(df: DataFrame, dv: DataFrame): DataFrame =
    df.join(dv.select(col("file").as("__dv_file"), col("pos").as("__dv_pos")),
      Seq("__dv_file", "__dv_pos"), "left_anti")

  /** Apply the version's DV to a scan of its files: anti-join on
    * (file name, row position), then drop the helper columns. `df`
    * must be an unprojected file-source scan of the version's files
    * (see [[withPosition]]). No DV: the scan passes through
    * untouched, `_metadata` never referenced. */
  def applyTo(spark: SparkSession, df: DataFrame, dataDir: String): DataFrame =
    read(spark, dataDir) match {
      case None => df
      case Some(dv) =>
        antiJoin(withPosition(df), dv).drop("__dv_file", "__dv_pos")
    }
}
