package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Big-big point-in-time (as-of) join — for each left row, the latest
  * right row with the same key whose timestamp is at or before the left
  * row's, with an optional staleness tolerance.
  *
  * The SCD as-ofs ([[graft.ops.Scd2.asOf]], [[graft.ops.Scd4]]) solve
  * the dimension-sized case by broadcasting the history; this operator
  * is the complement for the case where BOTH sides are fact-sized
  * (quotes ⋈ trades, clickstream state ⋈ conversions) and neither fits
  * a broadcast. A naive `right.ts <= left.ts` theta join plans as a
  * BroadcastNestedLoopJoin, and the windowed equi-join
  * (`row_number ... rn = 1`) pays a join AND a window shuffle.
  *
  * Scalable shape — the union-sort trick: tag both sides, union, and
  * run ONE window per key ordered by `(ts, side, tieBreak…)` where the
  * right side sorts before the left at equal timestamps (inclusive
  * match). `last(payload, ignoreNulls)` over the unbounded-preceding
  * frame carries the latest right payload forward into every left row.
  * The physical plan contains NO join operator at all: one hash
  * exchange on the key (both sides shuffled once, together), one sort,
  * one running window — the minimum possible data movement for the
  * semantics, and exactly what survives at 100 TB where neither side
  * broadcasts. Skew is per-key (a hyperactive key concentrates its
  * rows), the same exposure as any keyed window; the [[Salt.hotKeys]]
  * report is the diagnostic.
  *
  * Determinism: among right rows sharing `(key, ts)` the winner is the
  * LAST in `tieBreak` order (pass e.g. the event id), so the carried
  * payload is reproducible cross-engine — the oracle replays it as
  * `row_number() OVER (ORDER BY ts DESC, tieBreak DESC) = 1`.
  *
  * NULL semantics follow the equivalent JOIN, not window grouping: a
  * right row with a NULL key or NULL timestamp can never match (it is
  * dropped from the union — left as window input it would collide
  * with NULL-key left rows or sort ahead of every timestamp), and a
  * left row with a NULL timestamp matches nothing (explicit guard).
  */
object AsofJoin {

  /** As-of (backward, inclusive) join.
    *
    * @param left      probe side; ALL its columns are preserved
    * @param right     state side
    * @param keyCols   equi-key column names (present on both sides)
    * @param leftTs    left event-time column (numeric or timestamp)
    * @param rightTs   right event-time column (same type/scale)
    * @param valueCols right columns to carry into the output; emitted
    *                  as `right_<name>` (plus `right_<rightTs>`, the
    *                  matched timestamp), NULL when no right row at or
    *                  before the left timestamp exists
    * @param tolerance maximum allowed `leftTs - rightTs` staleness,
    *                  measured on `cast(ts as long)` — the column's own
    *                  units for numeric timestamps, whole SECONDS for
    *                  TIMESTAMP columns (Spark's timestamp→long cast);
    *                  older matches degrade to NULL rather than
    *                  silently serving stale state
    * @param tieBreak  right-side columns ordering rows that share
    *                  `(key, ts)` — the LAST in this order wins; pass a
    *                  unique id for a deterministic result
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val payloadCols = rightTs +: valueCols
    val payloadType = StructType(
      right.select(payloadCols.map(col): _*).schema.fields)
    // tie-break columns ride OUTSIDE the payload so the sort can see
    // them; on the left leg they are typed NULLs (side separates the
    // legs at equal ts, so left-leg ordering among ties is irrelevant)
    val tieTypes = tieBreak.map(c => right.schema(c).dataType)

    val rightLeg = right
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTs).isNotNull)
      .select(
      keyCols.map(col) ++
        Seq(col(rightTs).cast(left.schema(leftTs).dataType).as("__ts"),
          lit(0).as("__side"),
          struct(payloadCols.map(col): _*).as("__r"),
          lit(null).cast(StructType(left.schema.fields)).as("__l")) ++
        tieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }: _*)
    val leftLeg = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"),
          lit(1).as("__side"),
          lit(null).cast(payloadType).as("__r"),
          struct(left.columns.map(col): _*).as("__l")) ++
        tieTypes.zipWithIndex.map { case (t, i) =>
          lit(null).cast(t).as(s"__tb$i") }: _*)

    val ord: Seq[Column] =
      col("__ts") +: col("__side") +: tieBreak.indices.map(i => col(s"__tb$i"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("__r"), ignoreNulls = true).over(w)

    val matched = rightLeg.unionByName(leftLeg)
      .withColumn("__m",
        when(col("__ts").isNull, lit(null).cast(payloadType))
          .otherwise(carried))
      .filter(col("__side") === 1)
    val bounded = tolerance match {
      case Some(tol) => matched.withColumn("__m",
        when(col("__ts").cast("long") - col("__m")(rightTs).cast("long")
          > tol, lit(null).cast(payloadType)).otherwise(col("__m")))
      case None => matched
    }
    bounded.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col(s"__m.$c").as(s"right_$c")): _*)
  }

  /** As-of (forward, inclusive) join — for each left row, the EARLIEST
    * right row at or after its timestamp (time-to-next-event,
    * next-touch attribution). Same union-single-shuffle machinery as
    * [[asofBackward]], mirrored: the left side sorts BEFORE the right
    * at equal timestamps and the window carries the FIRST right payload
    * over the `[currentRow, unboundedFollowing]` frame, so among
    * equal-timestamp right rows the FIRST in `tieBreak` order wins
    * (the oracle replays it as `ORDER BY ts ASC, tieBreak ASC`).
    * `tolerance` bounds `rightTs - leftTs`. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val payloadCols = rightTs +: valueCols
    val payloadType = StructType(
      right.select(payloadCols.map(col): _*).schema.fields)
    val tieTypes = tieBreak.map(c => right.schema(c).dataType)

    val rightLeg = right
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTs).isNotNull)
      .select(
      keyCols.map(col) ++
        Seq(col(rightTs).cast(left.schema(leftTs).dataType).as("__ts"),
          lit(1).as("__side"),
          struct(payloadCols.map(col): _*).as("__r"),
          lit(null).cast(StructType(left.schema.fields)).as("__l")) ++
        tieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }: _*)
    val leftLeg = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"),
          lit(0).as("__side"),
          lit(null).cast(payloadType).as("__r"),
          struct(left.columns.map(col): _*).as("__l")) ++
        tieTypes.zipWithIndex.map { case (t, i) =>
          lit(null).cast(t).as(s"__tb$i") }: _*)

    val ord: Seq[Column] =
      col("__ts") +: col("__side") +: tieBreak.indices.map(i => col(s"__tb$i"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = first(col("__r"), ignoreNulls = true).over(w)

    val matched = rightLeg.unionByName(leftLeg)
      .withColumn("__m",
        when(col("__ts").isNull, lit(null).cast(payloadType))
          .otherwise(carried))
      .filter(col("__side") === 0)
    val bounded = tolerance match {
      case Some(tol) => matched.withColumn("__m",
        when(col("__m")(rightTs).cast("long") - col("__ts").cast("long")
          > tol, lit(null).cast(payloadType)).otherwise(col("__m")))
      case None => matched
    }
    bounded.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col(s"__m.$c").as(s"right_$c")): _*)
  }
}
