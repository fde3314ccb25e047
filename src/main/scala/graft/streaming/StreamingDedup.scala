package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SimHash, TextFunctions => T}

/** Streaming deduplication over a document ingest stream — the
  * stream-native counterpart of [[graft.operators.Dedup]].
  *
  * State is bounded by the watermark: `dropDuplicatesWithinWatermark`
  * keeps a key's dedup state only until the watermark passes it, so the
  * operator runs forever on an unbounded stream with state proportional to
  * the watermark window, not the corpus. That is the correct streaming
  * trade-off at 100 TB/day ingest: duplicates *within* the (hours-wide)
  * ingest window are dropped online and cheaply; cross-window duplicates
  * are the batch dedup's job ([[graft.operators.Dedup.exact]] over the
  * accumulated table), exactly how production dedup tiers are layered.
  *
  * Near-dup note: the streaming variant dedups on signature EQUALITY
  * (identical simhash64 — tokenization-insensitive near-exact matches).
  * Threshold-based near-dup needs the candidate-verify join, which is not
  * expressible as bounded per-key state; run it as the batch tier.
  */
object StreamingDedup {

  /** Exact streaming dedup on the normalized-text fingerprint. `tsCol`
    * must be the stream's event-time column; duplicates arriving within
    * `watermarkDelay` of the original are dropped. */
  def exact(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ingest_ts",
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__fp", T.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Near-exact streaming dedup on simhash64 equality (whitespace/token
    * jitter collapses to the same 64-bit signature; genuinely different
    * docs collide with probability ~2⁻⁶⁴). */
  def simhashExact(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ingest_ts",
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__sh",
        SimHash.simhash64(split(lower(trim(col(textCol))), "\\s+")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__sh")
      .drop("__sh")
}
