package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval×point range join — an operator Spark has no native form for
  * (a bare `l.start <= r.ts AND r.ts <= l.end` join plans as a
  * BroadcastNestedLoopJoin: O(|L|·|R|) comparisons and a broadcast
  * requirement, impossible at scale without an equi key).
  *
  * Scalable shape — time binning: intervals explode over the fixed-width
  * bins they cover, points map to their single bin, and the join becomes
  * an EQUI join on the bin id with the range predicate as a residual
  * filter. A qualifying (interval, point) pair meets in exactly ONE bin
  * (the point's), so no dedup pass is needed. Work is
  * O(|L|·bins_per_interval + |R|) shuffled rows plus per-bin products —
  * `binWidth` tunes the trade: ~the typical interval length is right
  * (each interval covers a couple of bins, each bin holds few intervals);
  * AQE's skew handling absorbs hot bins.
  */
object RangeJoin {

  /** Pairs every `left` interval `[startCol, endCol]` (inclusive ends,
    * long-typed — e.g. epoch micros) with the `right` points whose
    * `tsCol` falls inside. Output = left row ++ right row (inner join:
    * intervals containing no point drop out). */
  def intervalPoint(
      left: DataFrame,
      right: DataFrame,
      startCol: String,
      endCol: String,
      tsCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin",
      explode(sequence(expr(s"$startCol div $binWidth"),
        expr(s"$endCol div $binWidth"))))
    val r = right.withColumn("__bin", expr(s"$tsCol div $binWidth"))
    l.join(r, "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }

  /** Last-touch attribution — the canonical consumer of the time-binned
    * range join: every conversion attributes to the LATEST qualifying
    * touch of the same key strictly before it and within `windowUs`
    * (marketing attribution, click→purchase credit, cause-of-change
    * audits). Conversions with no qualifying touch keep null attribution
    * (they must stay visible — dropping them would overstate attributed
    * share).
    *
    * Shape: conversions expand over the ≤ `windowUs/binWidth + 1` bins
    * their lookback window covers, touches map to their single bin, and
    * the join is EQUI on (keys…, bin) with the range as a residual — the
    * [[intervalPoint]] scaling story, keyed. The per-conversion argmax is
    * one window over candidates (ties: latest `touchTsCol`, then lowest
    * `touchIdCol`), and unmatched conversions re-attach by a left join of
    * the conversion relation against the winners.
    *
    * Columns: output = all conversion columns + `touchIdCol` +
    * `gap_us` (conversion ts − touch ts; null when unattributed).
    * Timestamps are epoch-micro longs like the rest of the events
    * pipeline. */
  def lastTouch(
      conversions: DataFrame,
      touches: DataFrame,
      keys: Seq[String],
      convIdCol: String,
      convTsCol: String,
      touchIdCol: String,
      touchTsCol: String,
      windowUs: Long,
      binWidth: Long): DataFrame = {
    require(windowUs > 0 && binWidth > 0, "window and bin width must be positive")
    val c = conversions
      .withColumn("__start", col(convTsCol) - windowUs)
      .withColumn("__bin",
        explode(sequence(expr(s"__start div $binWidth"),
          expr(s"$convTsCol div $binWidth"))))
    val t = touches.select(
      (keys.map(col) :+ col(touchIdCol) :+ col(touchTsCol)
        :+ expr(s"$touchTsCol div $binWidth").as("__bin")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(convIdCol))
      .orderBy(col(touchTsCol).desc, col(touchIdCol))
    val winners = c.join(t, keys :+ "__bin")
      .filter(col(touchTsCol) >= col("__start") &&
        col(touchTsCol) < col(convTsCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(convIdCol), col(touchIdCol),
        (col(convTsCol) - col(touchTsCol)).as("gap_us"))
    conversions.join(winners, Seq(convIdCol), "left")
  }
}
