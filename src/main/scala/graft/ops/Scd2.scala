package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.core.Schemas

/** SCD Type-2 merge: apply a CDC delta to the history (staging) table —
  * the heart of the reference (`SCD-Configuration Setup.sql:143-153`,
  * `SCD-Automation.sql:83-93`; SURVEY.md §2.3 J2).
  *
  * Reference semantics (faithful mode):
  *   - match key = (business key, tracked column) — the SCD column is
  *     deliberately part of the key ("SCD column of Interest:
  *     SUPPLIER_STATE", `SCD-Automation.sql:85`);
  *   - WHEN MATCHED AND action='DELETE' → close out: `end_date = batchTime`,
  *     `current_flag = 'N'`;
  *   - WHEN NOT MATCHED AND action='INSERT' → open version:
  *     `start_date = batchTime`, `end_date = NULL`, `current_flag = 'Y'`;
  *   - '''one timestamp per cycle''' — all rows touched in a cycle share
  *     `batchTime` (`SCD-Configuration Setup.sql:255-264`; SURVEY.md §4b.3).
  *
  * Faithful mode reproduces the reference's two documented quirks
  * (SURVEY.md §4b.1-2): a supplier returning to a prior tracked value
  * matches its closed-out historical row so no new version opens, and a
  * name-only change closes the current row without reopening it (the row
  * retires from MASTER).
  *
  * Corrected mode (`faithful = false`) restricts both branches to
  * `current_flag = 'Y'` rows, so closed-out history never swallows a
  * returning value — a new version is opened as standard SCD2 would.
  *
  * Scale: the CDC delta is per-cycle small against an ever-growing history —
  * both joins broadcast the delta side by default so the 100 TB history
  * never shuffles; the history table itself is only ever appended-to/
  * column-touched via this rewrite, and should be stored partitioned by
  * `current_flag` (tiny hot partition) or bucketed by the business key.
  */
object Scd2 {

  /** Apply one CDC batch to the history table.
    *
    * @param staging   current history (base columns + start_date/end_date/
    *                  current_flag)
    * @param cdc       delta with `_action` (+ any other CDC metadata) columns
    * @param batchTime the single cycle timestamp
    * @param matchKeys business key + tracked column(s), reference-style
    */
  def merge(
      staging: DataFrame,
      cdc: DataFrame,
      batchTime: Timestamp,
      matchKeys: Seq[String],
      faithful: Boolean = true,
      broadcastCdc: Boolean = true): DataFrame = {

    val ts = lit(batchTime).cast(TimestampType)
    val baseCols = staging.columns.toSeq
      .filterNot(Seq("start_date", "end_date", "current_flag").contains)

    def hint(df: DataFrame) = if (broadcastCdc) broadcast(df) else df

    // Match-key equality: faithful mode keeps Snowflake's null-unsafe `=`
    // (a NULL tracked value never matches, so NULL-keyed images re-insert
    // every cycle — the reference's observable behavior); corrected mode
    // matches null-safely so NULL is one value like any other.
    def keyCond(left: String, right: String): Column =
      matchKeys.map { k =>
        if (faithful) col(s"$left.$k") === col(s"$right.$k")
        else col(s"$left.$k") <=> col(s"$right.$k")
      }.reduce(_ && _)

    // WHEN MATCHED AND action='DELETE' → close out.
    val closeKeys = hint(cdc
      .filter(col(Schemas.cdcActionCol) === "DELETE")
      .select(matchKeys.map(col): _*)
      .distinct()
      .withColumn("__close", lit(true)))

    val matchableForClose =
      if (faithful) lit(true) else col("st.current_flag") === "Y"

    val hit = col("__ck.__close").isNotNull && matchableForClose
    val closed = staging.alias("st")
      .join(closeKeys.alias("__ck"), keyCond("st", "__ck"), "left_outer")
      .select(staging.columns.toSeq.map {
        case "end_date" =>
          when(hit, ts).otherwise(col("st.end_date")).as("end_date")
        case "current_flag" =>
          when(hit, lit("N")).otherwise(col("st.current_flag")).as("current_flag")
        case c => col(s"st.$c").as(c)
      }: _*)

    // WHEN NOT MATCHED AND action='INSERT' → open a new version. In faithful
    // mode "matched" means *any* history row (closed-out rows swallow
    // returning values — SURVEY.md §4b.1); corrected mode anti-joins only
    // against current rows.
    val antiTarget =
      if (faithful) staging else staging.filter(col("current_flag") === "Y")

    val opened = cdc
      .filter(col(Schemas.cdcActionCol) === "INSERT")
      .select(baseCols.map(col): _*)
      .alias("in")
      .join(antiTarget.select(matchKeys.map(col): _*).alias("at"),
        keyCond("in", "at"), "left_anti")
      .withColumn("start_date", ts)
      .withColumn("end_date", lit(null).cast(TimestampType))
      .withColumn("current_flag", lit("Y"))

    closed.unionByName(opened).select(staging.columns.map(col).toSeq: _*)
  }

  /** INSERT OVERWRITE INTO master: the current view of the history
    * (`SCD-Configuration Setup.sql:160-161`; P1+P2+D4). */
  def currentView(staging: DataFrame, baseCols: Seq[String]): DataFrame =
    staging.filter(col("current_flag") === "Y").select(baseCols.map(col): _*)

  /** Point-in-time (as-of) join — THE consumption pattern of an SCD2
    * history: each fact row picks the dimension version that was valid at
    * its timestamp (`start_date <= ts` and `ts < end_date`, open versions
    * unbounded). Left join: facts with no valid version at their time
    * (unknown key, or ts before the first version) keep null dimension
    * columns. The SCD2 invariant (versions of a key have disjoint
    * [start, end) ranges) guarantees at most one match per fact.
    *
    * Plan shape: an EQUI join on the business key with the range predicate
    * as a residual filter — the hash/sort-merge join machinery (and AQE
    * skew handling) applies untouched, so this scales exactly like any
    * key join; the range never degenerates into a cross product. History
    * is often the small side when facts dominate — pass
    * `broadcastHistory = true` to hint that explicitly when the dimension
    * is KNOWN to fit an executor. The default is false: a forced broadcast
    * hint bypasses Spark's size threshold, so defaulting it on would OOM
    * on exactly the large histories this engine targets; with no hint AQE
    * still picks a broadcast join whenever the history measures small at
    * runtime, so small-dimension callers lose nothing. */
  /** Late-arriving correction splice — backfill a fact that arrives with
    * an effective timestamp IN THE PAST: each late record
    * `(keys…, corrected attrs…, tsCol)` finds its ENCLOSING version
    * (`start_date <= ts < end_date`, open versions unbounded) and splits
    * it at `ts`: `[start, ts)` keeps the old attributes and closes with
    * flag 'N'; `[ts, old end)` carries the corrected attributes and
    * inherits the enclosing row's end_date and flag (so splicing into the
    * open version leaves exactly one open row). A late ts equal to the
    * enclosing version's start replaces that version's attributes in
    * place — no empty segment is emitted. Late columns beyond the keys
    * and `tsCol` overwrite their staging columns; staging columns absent
    * from the late batch pass through from the enclosing version.
    *
    * [[merge]] can't express this: the cycle merge stamps everything with
    * `batchTime`, which is by definition ≥ every existing boundary. This
    * is the operator behind "the upstream system re-sent January with
    * corrections in March".
    *
    * At most ONE late record per key per call (callers loop batches —
    * each splice re-establishes the disjoint-interval invariant the next
    * batch relies on).
    *
    * Scale: the late batch broadcasts; the history streams map-side
    * through one left join and three narrow projections — the 100 TB
    * history is never shuffled, same shape as the cycle merge itself. */
  def spliceLate(
      staging: DataFrame,
      late: DataFrame,
      keys: Seq[String],
      tsCol: String = "effective_ts"): DataFrame = {
    val passCols = staging.columns.toSeq
    val attrCols = late.columns.filterNot(c => keys.contains(c) || c == tsCol)
    require(attrCols.forall(passCols.contains),
      s"late columns ${attrCols.mkString(",")} must exist in staging")
    val t = staging.alias("__t")
    val l = broadcast(late).alias("__l")
    val keyCond = keys.map(k => col(s"__t.$k") === col(s"__l.$k")).reduce(_ && _)
    val enclosing = col(s"__t.start_date") <= col(s"__l.$tsCol") &&
      (col(s"__t.end_date").isNull || col(s"__l.$tsCol") < col(s"__t.end_date"))
    val joined = t.join(l, keyCond && enclosing, "left")
    val matched = col(s"__l.$tsCol").isNotNull
    val boundary = col(s"__l.$tsCol") === col(s"__t.start_date")
    val untouched = joined.filter(!matched)
      .select(passCols.map(c => col(s"__t.$c").as(c)): _*)
    // [start, ts): old attributes, closed at the correction point
    val before = joined.filter(matched && !boundary)
      .select(passCols.map {
        case c @ "end_date" => col(s"__l.$tsCol").as(c)
        case c @ "current_flag" => lit("N").as(c)
        case c => col(s"__t.$c").as(c)
      }: _*)
    // [ts, old end): corrected attributes, inheriting end_date + flag
    val after = joined.filter(matched)
      .select(passCols.map {
        case c if attrCols.contains(c) => col(s"__l.$c").as(c)
        case c @ "start_date" => col(s"__l.$tsCol").as(c)
        case c => col(s"__t.$c").as(c)
      }: _*)
    untouched.unionByName(before).unionByName(after)
  }

  def pointInTime(
      facts: DataFrame,
      history: DataFrame,
      tsCol: String,
      keys: Seq[String],
      broadcastHistory: Boolean = false): DataFrame = {
    val f = facts.alias("__f")
    val h0 = history.alias("__h")
    val h = if (broadcastHistory) broadcast(h0) else h0
    val keyCond = keys.map(k => col(s"__f.$k") === col(s"__h.$k")).reduce(_ && _)
    val rangeCond = col(s"__f.$tsCol") >= col("__h.start_date") &&
      (col("__h.end_date").isNull || col(s"__f.$tsCol") < col("__h.end_date"))
    val dimCols = history.columns.filterNot(keys.contains)
    f.join(h, keyCond && rangeCond, "left")
      .select(facts.columns.map(c => col(s"__f.$c")) ++
        dimCols.map(c => col(s"__h.$c")): _*)
  }
}
