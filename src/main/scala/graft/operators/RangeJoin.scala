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
}
