package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Schemas

/** Incremental maintenance of an additive aggregate from a CDC stream —
  * materialized-view refresh whose cost is proportional to the DELTA,
  * not the corpus.
  *
  * The point of keeping a CDC stream at 100 TB is exactly this: a
  * downstream `GROUP BY` over the dimension does not need to rescan the
  * table each cycle. Because the stream presents every update as a
  * DELETE(old image) + INSERT(new image) pair
  * (`SCD-Configuration Setup.sql:224-227`), additive aggregates maintain
  * themselves by signed application: INSERT rows contribute `+measure`,
  * DELETE rows `-measure`, and `count` is the signed sum of ±1. One
  * signed aggregation of the delta plus one union-reaggregate against
  * the stored aggregate — both sized by the GROUP domain and the delta,
  * never the corpus.
  *
  * Only '''additive''' aggregates (count, sum, and anything derived from
  * them — avg = sum/count, with variance via sum-of-squares) maintain
  * incrementally under deletes. min/max do NOT: retracting the current
  * minimum needs the runner-up, which the aggregate no longer has — at
  * scale those need a full recompute or a mergeable sketch, and this
  * operator deliberately refuses to pretend otherwise.
  *
  * Groups whose maintained count reaches 0 are dropped — the result is
  * always identical to re-aggregating the post-delta table from scratch
  * (asserted by spec on the live pipeline, and by the DuckDB oracle
  * computing the full aggregate in closed form).
  */
object IncrementalAgg {

  /** Aggregate `df` from scratch into the maintained shape: `keys…, cnt,
    * sum_<m>…`. Use this to initialize the stored aggregate (and in tests
    * as the recompute oracle). */
  def fullAggregate(df: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +:
      measures.map(m => sum(col(m)).as(s"sum_$m"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Initialize a sketch-backed DISTINCT-count aggregate: one HLL
    * sketch per group over `distinctCol`. This is how count-distinct —
    * NOT additive, so out of [[applyCdc]]'s reach — still maintains
    * incrementally: HLL sketches are mergeable under union, so a
    * delta's sketch unions into the stored one in O(delta + groups),
    * and the corpus is never rescanned. The stored column is the
    * sketch BINARY (parquet-safe), estimates are read out on demand. */
  def fullDistinctSketch(df: DataFrame, keys: Seq[String],
      distinctCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(distinctCol)).as("sk"))

  /** Union an INSERT-ONLY batch into the stored sketch aggregate.
    * Insert-only is a hard contract, enforced structurally: a union
    * sketch cannot retract (removing a user from an HLL is
    * information-theoretically impossible), so a batch still carrying
    * the CDC `_action` column is REFUSED rather than silently
    * over-counted — pass the INSERT images explicitly, and rebuild the
    * sketch MV on the (rare) delete, the same honesty rule
    * [[applyCdc]] applies to min/max. */
  def applyInsertsDistinct(current: DataFrame, batch: DataFrame,
      keys: Seq[String], distinctCol: String): DataFrame = {
    require(!batch.columns.contains(Schemas.cdcActionCol),
      s"sketch distinct MV is insert-only: batch still carries " +
        s"'${Schemas.cdcActionCol}' — select the INSERT images " +
        "explicitly (deletes require a rebuild)")
    val delta = batch.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(distinctCol)).as("sk"))
    current.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("sk")).as("sk"))
  }

  /** Read estimates out of a sketch aggregate. */
  def estimateDistinct(mv: DataFrame, keys: Seq[String]): DataFrame =
    mv.select(keys.map(col) :+
      hll_sketch_estimate(col("sk")).as("approx_distinct"): _*)

  /** Apply one CDC delta (rows with `_action` INSERT/DELETE) to the
    * stored aggregate. Plan shape: signed partial aggregation of the
    * delta (shuffles only delta-sized data on the group key), union with
    * the stored aggregate (group-domain-sized), one re-aggregation.
    * Nothing in the plan scans the underlying table. */
  def applyCdc(current: DataFrame, cdc: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val sign = when(col(Schemas.cdcActionCol) === "DELETE", -1L)
      .otherwise(1L)
    val deltaAggs = sum(col("__sign")).as("cnt") +:
      measures.map(m => sum(col(m) * col("__sign")).as(s"sum_$m"))
    val delta = cdc
      .withColumn("__sign", sign)
      .groupBy(keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val mergeAggs = sum(col("cnt")).as("cnt") +:
      measures.map(m => sum(col(s"sum_$m")).as(s"sum_$m"))
    current.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .filter(col("cnt") > 0)
  }
}
