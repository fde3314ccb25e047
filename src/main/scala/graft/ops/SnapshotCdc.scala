package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.{Schemas, TableStore}

/** Table-stream (CDC) emulation — the one genuinely custom piece of the
  * reference's surface (SURVEY.md §2.7 W1).
  *
  * Snowflake's `CREATE STREAM ... ON TABLE landing`
  * (`SCD-Configuration Setup.sql:58`) exposes the delta between the last
  * consumption offset and the current table version as rows with metadata
  * columns, with two load-bearing semantics reproduced here:
  *
  *   - '''Update = DELETE(old image) + INSERT(new image) pair''' with
  *     `METADATA$ISUPDATE = TRUE` and a shared, version-stable
  *     `METADATA$ROW_ID` (`SCD-Configuration Setup.sql:221-232`).
  *   - '''Advance-on-consume''': DML over the stream moves the offset;
  *     the data is read exactly once (`SCD-Automation.sql:142`).
  *
  * Implementation: persist the table snapshot as of the last consumption in
  * a [[TableStore]]; `changes(current)` is a single full-outer join diff of
  * saved-snapshot vs current keyed on the business key; `commitVersion` is
  * obtained by staging the new snapshot and committing it '''in the same
  * manifest swap as the consumer's own write''' (see
  * [[graft.pipeline.ScdPipeline]]), which makes advance-on-consume atomic
  * with consumption — the §7.5.1 hard part.
  *
  * Scale: the diff join shuffles both snapshots on the key. At 100 TB the
  * snapshots should be written bucketed/partitioned by the key so the diff
  * is a co-partitioned join with no exchange; AQE handles skew. The row-id
  * is a deterministic md5 of the business key (stable across versions, like
  * the reference's ROW_ID; md5 chosen because every engine — including the
  * DuckDB oracle — computes it identically).
  */
class SnapshotCdc(
    store: TableStore,
    snapshotTable: String,
    keys: Seq[String],
    schema: StructType,
    /** When set, snapshots are staged hash-bucketed on `keys` with this
      * bucket count ([[TableStore.stageBucketed]]) so the diff against an
      * equally-bucketed current table runs with no Exchange on either
      * side — the scale story of the class doc, implemented. */
    buckets: Option[Int] = None) {

  def lastSnapshot: DataFrame = store.readOrEmpty(snapshotTable, schema)

  /** The unconsumed delta: diff(last committed snapshot, `current`).
    * Output = base columns + `_action` ('INSERT'|'DELETE') + `_is_update` +
    * `_row_id`. Reading is side-effect free (like SELECTing a stream,
    * `SCD-Configuration Setup.sql:127`); only a commit advances the offset. */
  def changes(current: DataFrame): DataFrame = diff(lastSnapshot, current, keys)

  /** Stage the post-consumption snapshot; include the returned
    * `snapshotTable -> version` in the consumer's commit to advance the
    * stream atomically with the consuming write. */
  def stageAdvance(current: DataFrame): (String, String) =
    snapshotTable -> (buckets match {
      case Some(n) => store.stageBucketed(snapshotTable, current, keys, n)
      case None    => store.stage(snapshotTable, current)
    })

  private def diff(prev: DataFrame, curr: DataFrame, keys: Seq[String]): DataFrame =
    SnapshotCdc.diff(prev, curr, keys)
}

object SnapshotCdc {

  /** Pure snapshot diff (J3 in SURVEY.md §2.3): emits
    *   - INSERT(_is_update=false) for keys only in `curr`;
    *   - DELETE(_is_update=false) for keys only in `prev`;
    *   - DELETE(old)+INSERT(new) with _is_update=true for keys present in
    *     both whose non-key columns differ (null-safely);
    *   - nothing for unchanged keys.
    * One full-outer join feeds both output branches. */
  def diff(prev: DataFrame, curr: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = curr.columns.toSeq
    val p = prev.withColumn("__p_present", lit(true)).alias("__p")
    val c = curr.withColumn("__c_present", lit(true)).alias("__c")
    val joinCond = keys.map(k => col(s"__p.$k") === col(s"__c.$k")).reduce(_ && _)
    val joined = p.join(c, joinCond, "full_outer")

    val pPresent = col("__p.__p_present").isNotNull
    val cPresent = col("__c.__c_present").isNotNull
    val valueChanged = cols.filterNot(keys.contains)
      .map(n => !(col(s"__p.$n") <=> col(s"__c.$n")))
      .reduceOption(_ || _).getOrElse(lit(false))

    def rowId(side: String) =
      md5(concat_ws("", keys.map(k => col(s"$side.$k")): _*))

    val inserts = joined
      .filter(cPresent && (!pPresent || valueChanged))
      .select(cols.map(n => col(s"__c.$n").as(n)) ++ Seq(
        lit("INSERT").as(Schemas.cdcActionCol),
        pPresent.as(Schemas.cdcIsUpdateCol),
        rowId("__c").as(Schemas.cdcRowIdCol)): _*)

    val deletes = joined
      .filter(pPresent && (!cPresent || valueChanged))
      .select(cols.map(n => col(s"__p.$n").as(n)) ++ Seq(
        lit("DELETE").as(Schemas.cdcActionCol),
        cPresent.as(Schemas.cdcIsUpdateCol),
        rowId("__p").as(Schemas.cdcRowIdCol)): _*)

    inserts.unionByName(deletes)
  }
}
