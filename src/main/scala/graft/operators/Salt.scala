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
