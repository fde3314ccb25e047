package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling for event streams: fixed-window OHLC
  * aggregation and forward-fill gap filling — the downsample-then-densify
  * pair behind metric dashboards, training-feature rollups, and any
  * "one row per (series, interval)" export from a ragged event log.
  *
  * Determinism discipline: window boundaries are integer floor-division
  * on the epoch-micros timestamp, first/last selection is tiebroken on
  * the event id (two events in one microsecond must pick the same OPEN
  * in every engine), and fill provenance is an explicit label — a
  * synthesized row silently shaped like an observation would poison any
  * downstream "events per interval" read.
  */
object Resample {

  /** Fixed-window OHLC resampling: one row per `(groupCol, bucket)` with
    * `open`/`close` = the value of the first/last event in the window
    * (timestamp order, id tiebreak), `high`/`low` = max/min value,
    * `n_events`, and the value sum. `bucket` is exact FLOOR division of
    * the epoch value by `bucketWidth` (`(ts − pmod(ts, w)) div w`, the
    * [[RangeJoin.intervalPointCount]] idiom — truncate-toward-zero
    * would merge pre-epoch timestamps into bucket 0). Null timestamps
    * and null values are dropped (an OHLC of nothing is no row, not a
    * null-shaped one).
    *
    * Plan shape: one narrow bucket projection, one window rank per
    * endpoint (partitioned by (group, bucket) — spill-safe, never
    * corpus-wide), one partial-combined aggregate. At 100 TB the
    * shuffle key is (series, bucket) — exactly the output key, so the
    * exchange is the one the downstream write wants. */
  def ohlc(df: DataFrame, tsCol: String, groupCol: String, valueCol: String,
      idCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val base = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"),
        expr(s"($tsCol - pmod($tsCol, ${bucketWidth}L)) div ${bucketWidth}L")
          .as("bucket"),
        col(tsCol).as("__ts"), col(idCol).as("__id"),
        col(valueCol).as("__v"))
    val wAsc = Window.partitionBy(col("grp"), col("bucket"))
      .orderBy(col("__ts"), col("__id"))
    val wDesc = Window.partitionBy(col("grp"), col("bucket"))
      .orderBy(col("__ts").desc, col("__id").desc)
    base
      .withColumn("__rn_a", row_number().over(wAsc))
      .withColumn("__rn_d", row_number().over(wDesc))
      .groupBy(col("grp").as(groupCol), col("bucket"))
      .agg(
        max(when(col("__rn_a") === 1, col("__v"))).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(when(col("__rn_d") === 1, col("__v"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("__v")).as("value_sum"))
  }

  /** Forward-fill gap filling over a resampled relation: densify every
    * group to the FULL observed bucket span (global min..max across all
    * groups — series alignment, the shape a feature matrix wants), and
    * fill each `fillCols` entry in a synthesized row with the latest
    * observed value at or before it. Rows carry `src` = 'obs' |
    * 'fill' — fill provenance stays auditable, and a leading gap
    * (before a group's first observation) stays null rather than
    * inventing a value backwards in time.
    *
    * Plan shape: the bucket spine is `groups × sequence(min, max)` —
    * group-cardinality × span, built from two broadcast-sized
    * relations, never a corpus shuffle; the fill is one
    * last-non-null window per group ordered by bucket (spill-safe
    * per-series sort, the exact layout a per-series export wants). */
  def gapFill(resampled: DataFrame, groupCol: String, bucketCol: String,
      fillCols: Seq[String]): DataFrame = {
    require(fillCols.nonEmpty, "fillCols must be non-empty")
    // the input plan is read three times (groups, span, spine join) —
    // scope-cache it so a caller handing in an unmaterialized pipeline
    // (ohlc over a raw event scan) computes it once, not thrice
    Dedup.withProjectionCache(resampled)(
      gapFillDense(_, groupCol, bucketCol, fillCols))
  }

  /** The densify-and-fill stage of [[gapFill]] over a materialized
    * resampled relation — split out so the plan pin can see the shape
    * the scope cache's trailing checkpoint hides. */
  private[graft] def gapFillDense(r: DataFrame, groupCol: String,
      bucketCol: String, fillCols: Seq[String]): DataFrame = {
    val groups = r.select(col(groupCol)).distinct()
    val span = r.agg(min(col(bucketCol)).as("__lo"),
      max(col(bucketCol)).as("__hi"))
    val spine = groups.crossJoin(broadcast(span))
      .select(col(groupCol),
        explode(sequence(col("__lo"), col("__hi"))).as(bucketCol))
    val joined = spine.join(
      r.withColumn("__obs", lit(true)),
      Seq(groupCol, bucketCol), "left")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = fillCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .withColumn("src", when(col("__obs"), "obs").otherwise("fill"))
      .drop("__obs")
  }
}
