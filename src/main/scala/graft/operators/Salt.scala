package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most runtime skew; explicit salting remains the tool
  * when one side must be shuffled on a key whose distribution is known-bad
  * ahead of time (e.g. a power-law business key at 100 TB).
  *
  * Shape: the skewed fact side gets a '''deterministic''' salt derived from
  * stable row columns (never `rand()` — a nondeterministic salt breaks
  * retry/replay semantics when a task is re-executed after failure); the
  * small dimension side is exploded ×`saltFactor`; the join key becomes
  * (key, salt). Each hot key's rows spread over `saltFactor` reducers.
  */
object Salt {

  /** Deterministic salt in [0, saltFactor) from arbitrary stable columns. */
  def saltColumn(saltFactor: Int, from: Column*): Column =
    pmod(xxhash64(from: _*), lit(saltFactor.toLong)).cast("int")

  /** Join a skewed `fact` to a small `dim` on `keys`, spreading each key
    * over `saltFactor` partitions. `saltFrom` must be stable fact columns
    * (defaults to all fact columns). `dim` is replicated ×`saltFactor` —
    * keep it dimension-sized. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 8,
      joinType: String = "inner",
      saltFrom: Seq[String] = Nil): DataFrame = {
    val saltSrc = (if (saltFrom.nonEmpty) saltFrom else fact.columns.toSeq).map(col)
    val saltedFact = fact.withColumn("__salt", saltColumn(saltFactor, saltSrc: _*))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFact.join(saltedDim, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (keys, salt), then final-aggregate on keys. Only needed for aggregates
    * where a single reducer per key is the bottleneck AND the aggregate
    * decomposes (sum/count/min/max); Spark's map-side partial aggregation
    * already covers the common case. */
  /** Hot-key diagnostic — the report run BEFORE deciding to salt: the
    * `topN` heaviest keys with their absolute counts and corpus share.
    * This is what tells you whether a join needs [[saltedJoin]] (one key
    * holding >1% of a 100 TB table will dominate a shuffle partition)
    * and what `saltFactor` to pick (≈ hot-key share ÷ even-partition
    * share).
    *
    * Plan shape: one partial-combined count aggregate, then a
    * distributed TakeOrdered for the top N — no global window, no
    * single-partition sort of the key space (the key table of a 100 TB
    * fact can itself be billions of rows); the grand total rides a
    * 1-row broadcast. Ties break on the key so the report is
    * deterministic. */
  def hotKeys(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = df.select(count(lit(1)).as("__total"))
    val top = counts
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topN)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy()
          .orderBy(col("cnt").desc, col(keyCol))))
      .select(col("rank").cast("long").as("rank"), col(keyCol), col("cnt"),
        round(col("cnt").cast("double") / col("__total"), 4).as("share"))
  }

  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = df.withColumn("__salt",
      saltColumn(saltFactor, df.columns.map(col).toIndexedSeq: _*))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }
}
