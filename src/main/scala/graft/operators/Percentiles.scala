package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact percentiles by sorting, not by value-map aggregation.
  *
  * Spark's built-in `percentile` is exact but accumulates a value→count
  * map per group per task and merges the maps on the reducer — fine when
  * the value domain is small, an executor-OOM when it isn't (at 100 TB a
  * continuous measure like a price has ~as many distinct values as rows,
  * so the "aggregation state" IS the column). The scale-safe formulation
  * is the sort: shuffle once on the group key, sort each group (both are
  * exactly what a window function plans), and read the interpolated
  * quantile off the ranked rows. State per task is zero — the sort spills
  * instead of OOMing, and Spark's range-partitioned sort handles a
  * skewed group by splitting it across tasks.
  *
  * Semantics match `percentile(col, p)` / DuckDB `quantile_cont`: linear
  * interpolation at rank `p*(n-1)` (0-based) over non-null values.
  */
object Percentiles {

  /** Exact interpolated percentiles per group, one output column per
    * requested percentile (named `p50`, `p90`, … from the fraction).
    *
    * Plan shape: ONE shuffle+sort (the ranking window over
    * `(groupCols, valueCol)`), a filter that keeps only the ≤2 boundary
    * rows per (group, percentile) — everything after operates on
    * `groups × percentiles × 2` rows, metadata-sized at any corpus
    * size — then a pivot-style final aggregation. */
  def exactByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      percentiles: Seq[Double]): DataFrame = {
    require(percentiles.nonEmpty, "percentiles must be non-empty")
    require(percentiles.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0,1]: $percentiles")
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    // rank + group size from the same window pass: count(*) over the
    // unbounded frame costs nothing extra once the partition is sorted,
    // and it avoids a join against a separate per-group count aggregate
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .select(gcols :+ col(valueCol).cast("double").as("__v"): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(gcols: _*)))

    // per percentile: 0-based target rank r = p*(n-1); the boundary rows
    // are floor(r)+1 and ceil(r)+1 (1-based rn). A row contributes
    // (1-frac) at the floor and frac at the ceil; when r is integral the
    // single row carries weight 1.
    val ps = array(percentiles.map(lit): _*)
    val contrib = ranked
      .select(gcols ++ Seq(col("__v"), col("__rn"), col("__n"),
        explode(ps).as("__p")): _*)
      .withColumn("__r", col("__p") * (col("__n") - 1))
      .withColumn("__lo", floor(col("__r")) + 1)
      .withColumn("__hi", ceil(col("__r")) + 1)
      .filter(col("__rn") === col("__lo") || col("__rn") === col("__hi"))
      .withColumn("__frac", col("__r") - floor(col("__r")))
      .withColumn("__w",
        when(col("__lo") === col("__hi"), lit(1.0))
          .when(col("__rn") === col("__lo"), lit(1.0) - col("__frac"))
          .otherwise(col("__frac")))

    val aggs = percentiles.map { p =>
      sum(when(col("__p") === p, col("__v") * col("__w"))).as(colName(p))
    }
    contrib.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact interpolated percentiles via a RANGE-partitioned parallel sort —
    * the form that scales when groups are few and huge (the common shape
    * of a fact-table metric: 3 return-flags × billions of rows).
    *
    * [[exactByGroup]]'s window sorts each group inside ONE task — correct,
    * spill-safe, but serial per group: 3 groups at 100 TB means 3 tasks
    * sorting 33 TB each. Here the data is `repartitionByRange` over
    * `(group, value)`, so a single group's sort spreads across many
    * partitions, each locally sorted in parallel. Global ranks are then
    * partition-local ranks plus per-partition offsets:
    *
    *   pass 1  per-(partition, group) row counts — `partitions × groups`
    *           tuples to the driver (metadata-sized for the few-huge-groups
    *           shape this targets; use [[exactByGroup]] when groups are
    *           high-cardinality);
    *   driver  prefix-sums offsets, computes each percentile's two global
    *           boundary ranks and their interpolation weights;
    *   pass 2  each partition streams its rows once, emitting only its
    *           boundary rows (≤ 2·|ps| per group) with weights attached.
    *
    * The shuffle is written once: the sorted partitions are persisted
    * across the two passes and released before returning (the returned
    * frame reads an eagerly-materialized, group-count-sized local
    * checkpoint). This is one of the rare genuinely per-partition
    * imperative computations (global rank assignment), hence the RDD zone;
    * everything before and after stays in the DataFrame planner. */
  def exactByGroupSorted(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      percentiles: Seq[Double],
      numPartitions: Option[Int] = None,
      maxGroups: Long = 10000L): DataFrame = {
    require(percentiles.nonEmpty, "percentiles must be non-empty")
    require(percentiles.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0,1]: $percentiles")
    // cardinality guard on pass 1's driver collect: it ships
    // partitions × groups count-tuples, metadata-sized ONLY for the
    // few-huge-groups shape this form targets. A caller pointing it at a
    // high-cardinality key (1M groups × 200 partitions = 200M tuples)
    // must not blow up the driver — measure first with a cheap
    // approx_count_distinct pass and hand that shape to the window form,
    // whose state is zero per group and which parallelizes fine when
    // groups are many.
    val approxGroups = df
      .agg(approx_count_distinct(struct(groupCols.map(col): _*)))
      .head().getLong(0)
    if (approxGroups > maxGroups)
      return exactByGroup(df, groupCols, valueCol, percentiles)
    val spark = df.sparkSession
    val gN = groupCols.length
    val proj = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
    val p = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sortCols = groupCols.map(col) :+ col("__v")
    val rdd = proj.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .rdd
    // SER storage: both passes stream the partition once, so the cache
    // trades one kryo decode per row for NOT holding tens of millions
    // of live Row objects between the passes — deserialized storage of
    // a 60M-row sf10 sort measured 2× slower end-to-end from GC alone
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // pass 1: (pid, group, count) — LinkedHashMap keeps range order
      val counts = rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]()
        it.foreach { r =>
          val k = (0 until gN).map(r.get)
          m.update(k, m.getOrElse(k, 0L) + 1L)
        }
        m.iterator.map { case (k, c) => (pid, k, c) }
      }.collect()

      // driver: per group, per-pid offsets in pid order, then for every
      // percentile the two boundary (globalRank → weight) entries routed
      // to the partition that holds them
      val targets = scala.collection.mutable
        .HashMap[Int, scala.collection.mutable.HashMap[(Seq[Any], Long),
          List[(Double, Double)]]]()
      counts.groupBy(_._2).foreach { case (g, slices) =>
        val inPidOrder = slices.sortBy(_._1)
        val n = inPidOrder.map(_._3).sum
        def route(globalRank: Long, p: Double, w: Double): Unit = {
          var remaining = globalRank
          var i = 0
          while (remaining > inPidOrder(i)._3) {
            remaining -= inPidOrder(i)._3; i += 1
          }
          val pid = inPidOrder(i)._1
          val m = targets.getOrElseUpdate(pid,
            scala.collection.mutable.HashMap.empty)
          val key = (g, remaining)
          m.update(key, (p, w) :: m.getOrElse(key, Nil))
        }
        percentiles.foreach { pct =>
          val r = pct * (n - 1)
          val lo = math.floor(r).toLong + 1
          val hi = math.ceil(r).toLong + 1
          val frac = r - math.floor(r)
          if (lo == hi) route(lo, pct, 1.0)
          else { route(lo, pct, 1.0 - frac); route(hi, pct, frac) }
        }
      }
      val bc = spark.sparkContext.broadcast(
        targets.view.mapValues(_.toMap).toMap)

      // pass 2: stream each partition once, emit only boundary rows
      val contribs = rdd.mapPartitionsWithIndex { (pid, it) =>
        bc.value.get(pid) match {
          case None => Iterator.empty
          case Some(t) =>
            val seen = scala.collection.mutable.HashMap[Seq[Any], Long]()
            it.flatMap { r =>
              val k = (0 until gN).map(r.get)
              val i = seen.getOrElse(k, 0L) + 1L
              seen.update(k, i)
              t.get((k, i)) match {
                case Some(ws) =>
                  val v = r.getDouble(gN)
                  ws.map { case (pct, w) =>
                    org.apache.spark.sql.Row.fromSeq(k ++ Seq(pct, v * w))
                  }
                case None => Nil
              }
            }
        }
      }
      val schema = org.apache.spark.sql.types.StructType(
        proj.schema.fields.take(gN) ++ Seq(
          org.apache.spark.sql.types.StructField("__p",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("__c",
            org.apache.spark.sql.types.DoubleType)))
      val aggs = percentiles.map { pct =>
        sum(when(col("__p") === pct, col("__c"))).as(colName(pct))
      }
      // group-count-sized: materialize before releasing the sorted rdd
      spark.createDataFrame(contribs, schema)
        .groupBy(groupCols.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .localCheckpoint(true)
    } finally rdd.unpersist(false)
  }

  /** `0.5 → p50`, `0.99 → p99`, `0.999 → p99_9`. */
  def colName(p: Double): String = {
    val pct = p * 100
    if (pct == pct.floor) s"p${pct.toLong}"
    else s"p${pct.toString.replace('.', '_').replaceAll("0+$", "")}"
  }
}
