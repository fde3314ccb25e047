package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) clustering for
  * min/max data skipping.
  *
  * A table sorted on one column skips files/row-groups only for
  * predicates on THAT column; a 100 TB fact table queried by several
  * dimensions (`part` AND `supplier`, `user` AND `time`) leaves every
  * other predicate a full scan. Interleaving the bits of the clustering
  * keys into one Morton code and range-partitioning + sorting on it
  * keeps every file's min/max range TIGHT in ALL interleaved dimensions
  * at once, so footer-stats pruning (parquet row-group stats, file-level
  * min/max manifests) works for any of them — the technique behind
  * OPTIMIZE ZORDER in lakehouse table formats (Morton 1966; the same
  * space-filling-curve trick as HBase/Accumulo shard keys).
  *
  * '''Correctness is engine-portable''': [[zValue]] is pure built-in bit
  * arithmetic (`shiftright`/`AND 1`/`shiftleft`/`OR`) over quantized
  * long inputs — whole-stage-codegen'd in Spark, and reproducible
  * closed-form in any SQL engine with shift operators (the
  * `layout_zorder` driver query hash-checks it against DuckDB).
  *
  * '''100 TB shape''': clustering is one `repartitionByRange` on the
  * z-value (a range shuffle with sampled bounds — the same cost as any
  * global sort-for-layout rewrite) followed by a within-partition sort;
  * nothing collects. The skipping payoff is read-side and compounds:
  * [[fileStats]]' per-file min/max is exactly what a scan planner
  * consults, and LayoutSpec asserts the z-ordered layout prunes a box
  * query in BOTH dimensions where the single-column sort prunes one.
  */
object Layout {

  /** Morton/Z-order code: interleaves the low `bits` bits of each input
    * column round-robin (bit `i` of input `j` lands at output bit
    * `i * n + j`). Inputs must already be non-negative and quantized to
    * `bits` bits — mask (`x & ((1<<bits)-1)`) or [[quantizeMinMax]]
    * first. `bits * cols.size` must fit a signed long. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 1, "zValue needs at least one column")
    require(bits >= 1 && bits * n <= 63,
      s"bits*cols must fit a signed long, got $bits*$n")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Linear min-max quantization of a numeric column onto `[0, 2^bits)`
    * — the float-dimension feeder for [[zValue]]. Values outside
    * `[minV, maxV]` clamp to the range ends. */
  def quantizeMinMax(c: Column, minV: Double, maxV: Double,
      bits: Int = 16): Column = {
    require(maxV > minV, s"need maxV > minV, got [$minV, $maxV]")
    val buckets = (1L << bits) - 1
    least(greatest(
        floor((c.cast("double") - lit(minV)) / lit(maxV - minV) *
          lit(buckets.toDouble)).cast("long"),
        lit(0L)), lit(buckets))
  }

  /** Rewrite `df` as a z-clustered parquet layout: range-partition on
    * the Morton code of `dims` into `numFiles` output files, sort within
    * each, drop the helper column. The write-side half of OPTIMIZE
    * ZORDER. */
  def writeZClustered(df: DataFrame, path: String, dims: Seq[Column],
      bits: Int = 16, numFiles: Int = 16): Unit =
    df.withColumn("__z", zValue(dims, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of `statCols` — the footer-stats view a pruning
    * scan planner consults. Output: `(file, <c>_min, <c>_max, ...)`,
    * one row per file. */
  def fileStats(spark: SparkSession, path: String,
      statCols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(statCols.flatMap(c =>
        Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))).head,
        statCols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"),
            max(col(c)).as(s"${c}_max"))).tail: _*)

  /** How many files of a layout a box query must read: counts files
    * whose `[min, max]` interval overlaps `[lo, hi]` in EVERY queried
    * dimension (a file skips as soon as one dimension's interval misses
    * the box — the standard stats-pruning rule). */
  def filesTouched(stats: DataFrame,
      box: Seq[(String, Long, Long)]): Long =
    stats.filter(box.map { case (c, lo, hi) =>
        col(s"${c}_max") >= lo && col(s"${c}_min") <= hi
      }.reduce(_ && _))
      .count()
}
