package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between time windows of a fact table —
  * the check a training-data pipeline runs before every refresh: "does
  * this week's data still look like the data the model saw?".
  *
  * The metric is total-variation distance (TVD = ½·Σ|p_b − q_b|) over a
  * fixed histogram binning, chosen over the classical PSI deliberately:
  * PSI's `ln(p/q)` drags in libm transcendentals whose last-ulp behavior
  * differs across engines, while TVD on counts reduces to EXACT integer
  * arithmetic — `Σ|c_base·n_cur − c_cur·n_base|` accumulates in Longs
  * (associative, order-independent under Spark's partial aggregation)
  * with ONE closing division — so the result is bit-reproducible and
  * hash-checkable cross-engine, the same determinism discipline as the
  * media descriptors. TVD is bounded in [0,1] with the same "bigger =
  * more drift" reading as PSI.
  *
  * Plan shape (the 100 TB story): one scan → slim (group, window, bin)
  * rows → two partial-combined hash aggregates; the split boundary is a
  * 1-row broadcast (global min/max day), nothing else leaves the
  * executors. No windows, no sort, no per-group subqueries. */
object Drift {

  /** TVD per `groupCol` between the first and second half of the date
    * range (split at the midpoint day, inclusive left). `valueCol` is
    * binned as `min(floor(value / binWidth), nBins−1)`; NULL values are
    * excluded (SQL-aggregate semantics). Returns
    * `(groupCol, n_base, n_cur, tvd)`. */
  def tvdByGroup(df: DataFrame, groupCol: String, dayCol: String,
      valueCol: String, binWidth: Double, nBins: Int): DataFrame = {
    val ev = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(dayCol).as("__day"),
        least(floor(col(valueCol) / lit(binWidth)).cast("long"),
          lit(nBins - 1L)).as("__bin"))
    val bounds = ev.agg(min(col("__day")).as("__mn"), max(col("__day")).as("__mx"))
    val counts = ev.crossJoin(broadcast(bounds))
      .withColumn("__base",
        col("__day") <= date_add(col("__mn"),
          (datediff(col("__mx"), col("__mn")) / 2).cast("int")))
      .groupBy(col(groupCol), col("__bin"))
      .agg(
        sum(when(col("__base"), 1L).otherwise(0L)).as("__cb"),
        sum(when(!col("__base"), 1L).otherwise(0L)).as("__cc"))
    tvdFromCounts(counts, groupCol)
  }

  /** TVD over a CATEGORICAL column between the two halves of the date
    * range — the string-column half of drift monitoring (language mix,
    * source mix, event mix). Identical exact-integer machinery to
    * [[tvdByGroup]], but the category IS the bin: no binWidth to tune,
    * state bounded by the (group, category) domain. Categories present
    * in only one half zero-fill naturally (they are rows of the same
    * count aggregate). Returns `(groupCol, n_base, n_cur, tvd)`. */
  def tvdCategoricalByGroup(df: DataFrame, groupCol: String,
      dayCol: String, catCol: String): DataFrame = {
    val ev = df.filter(col(catCol).isNotNull)
      .select(col(groupCol), col(dayCol).as("__day"),
        col(catCol).as("__bin"))
    val bounds = ev.agg(min(col("__day")).as("__mn"),
      max(col("__day")).as("__mx"))
    val counts = ev.crossJoin(broadcast(bounds))
      .withColumn("__base",
        col("__day") <= date_add(col("__mn"),
          (datediff(col("__mx"), col("__mn")) / 2).cast("int")))
      .groupBy(col(groupCol), col("__bin"))
      .agg(
        sum(when(col("__base"), 1L).otherwise(0L)).as("__cb"),
        sum(when(!col("__base"), 1L).otherwise(0L)).as("__cc"))
    tvdFromCounts(counts, groupCol)
  }

  /** The shared binning expression: `min(floor(value / binWidth),
    * nBins−1)` — one deterministic double division + floor, identical
    * on any engine. */
  def binOf(value: Column, binWidth: Double, nBins: Int): Column =
    least(floor(value / lit(binWidth)).cast("long"), lit(nBins - 1L))

  /** Histogram of `valueCol` per (`groupCol`, bin) — the STORED form of
    * the drift baseline: kilobytes per group, so tomorrow's drift check
    * reads this table instead of rescanning yesterday's corpus. NULL
    * values are excluded, matching [[tvdByGroup]]. */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Double, nBins: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), binOf(col(valueCol), binWidth, nBins).as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** TVD between two histograms in (`groupCol`, bin, cnt) form — the
    * comparison both stored-baseline paths share (batch increment or
    * stream-accumulated counts): full outer on (group, bin), zero-fill,
    * then the exact-integer TVD tail. */
  def tvdBetweenHistograms(baseHist: DataFrame, curHist: DataFrame,
      groupCol: String): DataFrame =
    tvdFromCounts(
      zeroFilledJoin(baseHist, curHist, groupCol)
        .select(col(groupCol), col("bin").as("__bin"),
          col("__cb"), col("__cc")),
      groupCol)

  /** The one histogram-pair join both the TVD and its drilldown share:
    * full outer on (group, bin), absent side zero-filled — so a change
    * to this contract (e.g. null-bin handling) can never desynchronize
    * the metric from its own per-bin decomposition. Returns
    * `(groupCol, bin, __cb, __cc)`. */
  private def zeroFilledJoin(baseHist: DataFrame, curHist: DataFrame,
      groupCol: String): DataFrame =
    baseHist.withColumnRenamed("cnt", "__cb")
      .join(curHist.withColumnRenamed("cnt", "__cc"),
        Seq(groupCol, "bin"), "full_outer")
      .select(col(groupCol), col("bin"),
        coalesce(col("__cb"), lit(0L)).as("__cb"),
        coalesce(col("__cc"), lit(0L)).as("__cc"))

  /** A single-slice histogram `(bin, cnt)` tagged with the constant
    * group the grouped machinery expects. */
  private def constGroup(df: DataFrame): DataFrame =
    df.select(lit("all").as("__g"), col("bin"), col("cnt"))

  /** TVD of a current slice against a STORED baseline histogram — the
    * O(increment) monitoring shape: the baseline never rescans (it is a
    * (group, bin, cnt) table, kilobytes at any corpus size), only the
    * increment aggregates, and the metric is the same exact integer
    * arithmetic as [[tvdByGroup]] (a baseline written and read back
    * yields bit-identical TVD — the storage round trip is pure). Groups
    * present on only one side keep their rows (full outer, zero-fill),
    * surfacing "new group appeared / group vanished" as TVD 0/undefined
    * rather than silently dropping them. */
  def tvdAgainstBaseline(cur: DataFrame, baseline: DataFrame,
      groupCol: String, valueCol: String,
      binWidth: Double, nBins: Int): DataFrame =
    tvdBetweenHistograms(baseline,
      histogram(cur, groupCol, valueCol, binWidth, nBins), groupCol)

  /** Embedding-distribution drift — the vector-space member of the
    * drift family: bucket both slices with the PORTABLE hyperplane
    * bits (namespace `"drift:"`, independent of every retrieval
    * table), then the same exact-integer TVD over the two bucket
    * histograms. An embedding corpus that shifts (new domain, model
    * refresh, poisoned batch) moves probability mass between
    * half-space sign patterns long before any single coordinate's
    * numeric histogram alarms, and the bucket histogram is
    * `2^numPlanes` longs per slice — kilobytes at any corpus size, so
    * the baseline side can be a STORED histogram exactly like
    * [[tvdAgainstBaseline]] (the `(bin, cnt)` shape is identical;
    * pass it through [[tvdBetweenHistograms]] with a constant group).
    * `numPlanes` here is bin GRANULARITY, not blocking (nothing
    * expands pairs), so a fixed default is the right shape — unlike
    * the dedup family's occupancy-adaptive sizing. Output: one row
    * `(n_base, n_cur, tvd)`; the closed-form bucket bits make the
    * whole metric replayable in an external engine. */
  def tvdEmbeddingShift(base: DataFrame, cur: DataFrame,
      vecCol: String = "embedding", numPlanes: Int = 8,
      dim: Int = 64): DataFrame =
    tvdEmbeddingHistograms(
      embeddingHistogram(base, vecCol, numPlanes, dim),
      embeddingHistogram(cur, vecCol, numPlanes, dim))

  /** The embedding bucket histogram in STORABLE `(bin, cnt)` form —
    * `2^numPlanes` longs at any corpus size, the drift-baseline shape:
    * persist yesterday's histogram (a parquet write of kilobytes) and
    * tomorrow's check aggregates ONLY the increment
    * ([[tvdEmbeddingHistograms]] with the stored side read back — the
    * storage round trip is pure, bit-identical TVD). */
  def embeddingHistogram(df: DataFrame, vecCol: String = "embedding",
      numPlanes: Int = 8, dim: Int = 64): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(embeddingBin(col(vecCol), numPlanes, dim).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))

  /** The per-row bucket expression behind [[embeddingHistogram]] — for
    * feeds that bin BEFORE aggregating elsewhere (e.g. a streaming
    * micro-batch accumulator maintaining the current histogram): the
    * portable `"drift:"`-namespace hyperplane sign pattern as a bit
    * string. */
  def embeddingBin(vec: Column, numPlanes: Int = 8,
      dim: Int = 64): Column =
    graft.functions.VectorFunctions.portableBucketBits(vec,
      graft.functions.VectorFunctions
        .portablePlanes(numPlanes, dim, ns = "drift:"))

  /** TVD between two [[embeddingHistogram]]s (either side may come
    * from storage) — one row `(n_base, n_cur, tvd)`. */
  def tvdEmbeddingHistograms(baseHist: DataFrame,
      curHist: DataFrame): DataFrame =
    tvdBetweenHistograms(constGroup(baseHist), constGroup(curHist), "__g")
      .select(col("n_base"), col("n_cur"), col("tvd"))

  /** The drilldown behind a TVD alarm: WHICH bins moved. Per
    * (`groupCol`, bin) of the two histograms (full outer, zero-fill),
    * the exact per-bin numerator `|c_base·n_cur − c_cur·n_base|` ranks
    * the movers (ties by bin — the numerator is exact integer, so the
    * order is engine-independent), and `contrib` is that bin's additive
    * share of the group's TVD (pre-rounding, the contribs of ALL bins
    * sum to the [[tvdBetweenHistograms]] value; the top-k rows answer "what
    * changed" — a new dominant language, a poisoned embedding region —
    * without any further scan). Returns the top `k` rows per group:
    * `(groupCol, rank, bin, cnt_base, cnt_cur, contrib)`.
    *
    * Scale shape: inputs are HISTOGRAMS (bins × groups rows — kilobytes
    * regardless of corpus size), so the per-group window here ranks a
    * bounded relation; the corpus-sized work already happened in the
    * one aggregate that built each histogram. */
  def tvdTopMovers(baseHist: DataFrame, curHist: DataFrame,
      groupCol: String, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    zeroFilledJoin(baseHist, curHist, groupCol)
      .select(col(groupCol), col("bin"),
        col("__cb").as("cnt_base"), col("__cc").as("cnt_cur"))
      .withColumn("__nb", sum(col("cnt_base")).over(w))
      .withColumn("__nc", sum(col("cnt_cur")).over(w))
      .withColumn("__num",
        abs(col("cnt_base") * col("__nc") - col("cnt_cur") * col("__nb")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
          .orderBy(col("__num").desc, col("bin"))))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank").cast("long").as("rank"), col("bin"),
        col("cnt_base"), col("cnt_cur"),
        when(col("__nb") > 0 && col("__nc") > 0,
          round(col("__num").cast("double") /
            (col("__nb").cast("double") * col("__nc") * 2.0), 4))
          .as("contrib"))
  }

  /** [[tvdTopMovers]] over two [[embeddingHistogram]]s (either side may
    * come from storage): which embedding-space regions (hyperplane sign
    * patterns) absorbed or lost probability mass. Returns
    * `(rank, bin, cnt_base, cnt_cur, contrib)`. */
  def embeddingTopMovers(baseHist: DataFrame, curHist: DataFrame,
      k: Int = 10): DataFrame =
    tvdTopMovers(constGroup(baseHist), constGroup(curHist), "__g", k)
      .select(col("rank"), col("bin"), col("cnt_base"), col("cnt_cur"),
        col("contrib"))

  /** Shared tail: per-bin `|c_base·n_cur − c_cur·n_base|` accumulated in
    * Longs (exact, order-independent under partial aggregation); the
    * single division happens once per group. */
  private def tvdFromCounts(counts: DataFrame, groupCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    counts
      .withColumn("__nb", sum(col("__cb")).over(w))
      .withColumn("__nc", sum(col("__cc")).over(w))
      .groupBy(col(groupCol))
      .agg(
        first(col("__nb")).as("n_base"),
        first(col("__nc")).as("n_cur"),
        sum(abs(col("__cb") * col("__nc") - col("__cc") * col("__nb")))
          .as("__num"))
      .select(col(groupCol), col("n_base"), col("n_cur"),
        // a group missing from one window has no defined drift — NULL,
        // explicitly (ANSI mode would otherwise throw on the 0 divisor)
        when(col("n_base") > 0 && col("n_cur") > 0,
          round(col("__num").cast("double") /
            (col("n_base").cast("double") * col("n_cur") * 2.0), 4))
          .as("tvd"))
  }
}
