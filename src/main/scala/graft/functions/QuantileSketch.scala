package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{lit, udaf, udf}

/** Mergeable quantile-sketch aggregates (KLL, Apache DataSketches — the
  * same library Spark's built-in `hll_sketch_agg` family wraps for
  * distinct counts; Spark ships no quantile twin, so this supplies it).
  *
  * The 100 TB shape is the sketch TABLE, mirroring the HLL precedent
  * (`sketch_distinct_merged`): one pass over the fact table builds a
  * compact KLL per fine slice (type × day); any coarser rollup —
  * arbitrary date ranges, type groups, global — is then a union of
  * sketch BYTES (`kllUnionAgg`), kilobytes of input instead of a
  * rescan. KLL guarantees ~1.65% normalized rank error at the default
  * k = 200 regardless of stream length, and unions never widen the
  * bound, so a materialized daily sketch table answers "p99 latency for
  * any week" from row-count-independent state.
  *
  * Execution notes: the live heap sketch rides Spark's
  * `TypedImperativeAggregate` as a RAW object — per-row `update` is a
  * few comparisons with NO serialization; the compact byte form is
  * produced only at partial-output/shuffle boundaries (the
  * [[KllHolder]] Java-serialization hook) — the same partial-combine
  * shape as any native aggregate. KLL compaction is randomized
  * (public algorithm property), so sketch BYTES are not replayable
  * cross-engine; queries expose deterministic exact columns plus
  * rank-error contracts with ≥3× margin over the k = 200 guarantee
  * (violation odds far below any practical flake rate), the same
  * verification discipline as the HLL query. */
object QuantileSketch {

  /** Serialization shell for the aggregation buffer: in memory it holds
    * the live heap sketch; across the wire it is the sketch's own
    * compact byte form (written only when a partial aggregate leaves
    * the operator, never per row). */
  final class KllHolder(@transient var sk: KllDoublesSketch)
      extends Serializable {
    private def writeObject(o: java.io.ObjectOutputStream): Unit = {
      val b = sk.toByteArray
      o.writeInt(b.length); o.write(b)
    }
    private def readObject(i: java.io.ObjectInputStream): Unit = {
      val n = i.readInt()
      val b = new Array[Byte](n); i.readFully(b)
      sk = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  private def holderEnc: Encoder[KllHolder] =
    Encoders.javaSerialization(classOf[KllHolder])

  private class BuildAgg(k: Int)
      extends Aggregator[Double, KllHolder, Array[Byte]] {
    def zero: KllHolder = new KllHolder(KllDoublesSketch.newHeapInstance(k))
    def reduce(h: KllHolder, v: Double): KllHolder = { h.sk.update(v); h }
    def merge(a: KllHolder, b: KllHolder): KllHolder = { a.sk.merge(b.sk); a }
    def finish(h: KllHolder): Array[Byte] = h.sk.toByteArray
    def bufferEncoder: Encoder[KllHolder] = holderEnc
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private class UnionAgg(k: Int)
      extends Aggregator[Array[Byte], KllHolder, Array[Byte]] {
    def zero: KllHolder = new KllHolder(KllDoublesSketch.newHeapInstance(k))
    def reduce(h: KllHolder, b: Array[Byte]): KllHolder = {
      if (b != null && b.nonEmpty)
        h.sk.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
      h
    }
    def merge(a: KllHolder, b: KllHolder): KllHolder = { a.sk.merge(b.sk); a }
    def finish(h: KllHolder): Array[Byte] = h.sk.toByteArray
    def bufferEncoder: Encoder[KllHolder] = holderEnc
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a double column into compact KLL sketch bytes. NULL
    * handling is the caller's: filter nulls before aggregating (the
    * primitive input encoder would otherwise read them as 0.0 — a
    * silent corruption, so the operator refuses to guess). */
  def kllAgg(value: Column, k: Int = 200): Column =
    udaf(new BuildAgg(k), Encoders.scalaDouble).apply(value)

  /** Union a column of KLL sketch bytes into one sketch — the rollup
    * aggregate over a sketch table; bytes-sized input, never a rescan. */
  def kllUnionAgg(sketch: Column, k: Int = 200): Column =
    udaf(new UnionAgg(k), Encoders.BINARY).apply(sketch)

  // scalar extraction: runs on the handful of post-aggregate rows, so a
  // plain (non-codegen) udf costs nothing
  private val quantileUdf = udf((b: Array[Byte], q: Double) =>
    if (b == null || b.isEmpty) None
    else {
      val sk = KllDoublesSketch.heapify(Memory.wrap(b))
      if (sk.isEmpty) None else Some(sk.getQuantile(q))
    })

  private val nUdf = udf((b: Array[Byte]) =>
    if (b == null || b.isEmpty) 0L
    else KllDoublesSketch.heapify(Memory.wrap(b)).getN)

  /** Estimated quantile at rank `q` from sketch bytes (inclusive rank
    * semantics — the returned value is a retained stream item whose
    * normalized rank is within the sketch's ε of `q`). */
  def kllQuantile(sketch: Column, q: Double): Column =
    quantileUdf(sketch, lit(q))

  /** Exact stream length carried by the sketch (KLL tracks n exactly). */
  def kllN(sketch: Column): Column = nUdf(sketch)
}
