package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{lit, udaf, udf}

/** Mergeable heavy-hitters (frequent-items) sketch aggregates — the
  * top-k twin of the HLL distinct-count and KLL quantile sketch tables
  * (Apache DataSketches `ItemsSketch`, the Misra–Gries/Space-Saving
  * family).
  *
  * The 100 TB shape mirrors the other sketch tables: one pass over the
  * corpus builds a compact sketch per fine slice (source, day, shard);
  * any rollup — "hot tokens across the whole crawl", "heavy users for
  * any date range" — is a union of sketch BYTES, kilobytes instead of a
  * rescan. The maintained guarantee (maxMapSize `m`): every item whose
  * true count exceeds the sketch's a-posteriori `maximumError` (≤
  * ~3.5·N/m) is RETAINED — the NO_FALSE_NEGATIVES frequent set can
  * over-report but never lose a genuine heavy hitter — and each
  * estimate brackets the true count as `lb ≤ true ≤ ub` with
  * `ub − lb ≤ maximumError`. Unions keep both properties.
  *
  * Same execution shape as [[QuantileSketch]]: the live heap sketch
  * rides the aggregation buffer raw (per-row update is a hash-map
  * bump), serialized only at partial-output boundaries. Sketch BYTES
  * are engine-specific; queries expose deterministic exact columns
  * plus the retained/bracket contracts as oracle-predicted booleans. */
object FrequencySketch {

  private val serDe = new ArrayOfStringsSerDe

  /** Serialization shell: live heap sketch in memory, compact bytes on
    * the wire (see [[QuantileSketch.KllHolder]]). */
  final class FreqHolder(@transient var sk: ItemsSketch[String])
      extends Serializable {
    private def writeObject(o: java.io.ObjectOutputStream): Unit = {
      val b = sk.toByteArray(serDe)
      o.writeInt(b.length); o.write(b)
    }
    private def readObject(i: java.io.ObjectInputStream): Unit = {
      val n = i.readInt()
      val b = new Array[Byte](n); i.readFully(b)
      sk = ItemsSketch.getInstance(Memory.wrap(b), serDe)
    }
  }

  private def holderEnc: Encoder[FreqHolder] =
    Encoders.javaSerialization(classOf[FreqHolder])

  private class BuildAgg(maxMapSize: Int)
      extends Aggregator[String, FreqHolder, Array[Byte]] {
    def zero: FreqHolder = new FreqHolder(new ItemsSketch[String](maxMapSize))
    def reduce(h: FreqHolder, v: String): FreqHolder = {
      if (v != null) h.sk.update(v)
      h
    }
    def merge(a: FreqHolder, b: FreqHolder): FreqHolder = { a.sk.merge(b.sk); a }
    def finish(h: FreqHolder): Array[Byte] = h.sk.toByteArray(serDe)
    def bufferEncoder: Encoder[FreqHolder] = holderEnc
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private class UnionAgg(maxMapSize: Int)
      extends Aggregator[Array[Byte], FreqHolder, Array[Byte]] {
    def zero: FreqHolder = new FreqHolder(new ItemsSketch[String](maxMapSize))
    def reduce(h: FreqHolder, b: Array[Byte]): FreqHolder = {
      if (b != null && b.nonEmpty)
        h.sk.merge(ItemsSketch.getInstance(Memory.wrap(b), serDe))
      h
    }
    def merge(a: FreqHolder, b: FreqHolder): FreqHolder = { a.sk.merge(b.sk); a }
    def finish(h: FreqHolder): Array[Byte] = h.sk.toByteArray(serDe)
    def bufferEncoder: Encoder[FreqHolder] = holderEnc
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a string column into compact frequent-items sketch
    * bytes. `maxMapSize` must be a power of 2 (library contract); NULL
    * items are skipped. */
  def freqAgg(item: Column, maxMapSize: Int = 1024): Column =
    udaf(new BuildAgg(maxMapSize), Encoders.STRING).apply(item)

  /** Union a column of frequent-items sketch bytes — the rollup
    * aggregate over a sketch table. */
  def freqUnionAgg(sketch: Column, maxMapSize: Int = 1024): Column =
    udaf(new UnionAgg(maxMapSize), Encoders.BINARY).apply(sketch)

  // scalar extraction over the handful of post-aggregate rows
  private val estimateUdf = udf((b: Array[Byte], item: String) =>
    if (b == null || b.isEmpty) 0L
    else ItemsSketch.getInstance(Memory.wrap(b), serDe).getEstimate(item))

  private val lowerUdf = udf((b: Array[Byte], item: String) =>
    if (b == null || b.isEmpty) 0L
    else ItemsSketch.getInstance(Memory.wrap(b), serDe).getLowerBound(item))

  private val upperUdf = udf((b: Array[Byte], item: String) =>
    if (b == null || b.isEmpty) 0L
    else ItemsSketch.getInstance(Memory.wrap(b), serDe).getUpperBound(item))

  private val maxErrorUdf = udf((b: Array[Byte]) =>
    if (b == null || b.isEmpty) 0L
    else ItemsSketch.getInstance(Memory.wrap(b), serDe).getMaximumError)

  private val retainedUdf = udf((b: Array[Byte]) =>
    if (b == null || b.isEmpty) Array.empty[String]
    else ItemsSketch.getInstance(Memory.wrap(b), serDe)
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem))

  /** Point estimate of an item's count. */
  def freqEstimate(sketch: Column, item: Column): Column =
    estimateUdf(sketch, item)

  /** Deterministic bracket: `lb ≤ true count ≤ ub` always holds. */
  def freqLowerBound(sketch: Column, item: Column): Column =
    lowerUdf(sketch, item)
  def freqUpperBound(sketch: Column, item: Column): Column =
    upperUdf(sketch, item)

  /** A-posteriori maximum estimation error of the sketch (0 while the
    * sketch is still exact — fewer distinct items than the map holds). */
  def freqMaxError(sketch: Column): Column = maxErrorUdf(sketch)

  private val streamLengthUdf = udf((b: Array[Byte]) =>
    if (b == null || b.isEmpty) 0L
    else ItemsSketch.getInstance(Memory.wrap(b), serDe).getStreamLength)

  /** EXACT total weight the sketch has absorbed (ItemsSketch carries n
    * exactly, through unions) — the exactly-once witness for streamed
    * accumulation: any re-counted batch inflates it. */
  def freqStreamLength(sketch: Column): Column = streamLengthUdf(sketch)

  /** The NO_FALSE_NEGATIVES frequent set: contains EVERY item whose
    * true count exceeds [[freqMaxError]] (may contain lighter ones). */
  def freqRetained(sketch: Column): Column = retainedUdf(sketch)
}
