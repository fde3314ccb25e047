package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting, shingling.
  *
  * All of these are composed from built-in `org.apache.spark.sql.functions`
  * (codegen'd, whole-stage-compatible, no UDFs) so they vectorize over
  * 100 TB of text exactly like any other projection: narrow, no shuffle,
  * pushed inside the parquet scan's codegen stage. Everything is
  * deterministic — same text, same score on every engine — which also makes
  * each function SQL-expressible for the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace token count (the `\s+` tokenizer). Empty/blank text → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-style pre-tokenizer count: the GPT-2 pre-tokenization regex family
    * (contractions | space-prefixed letter runs | digit runs | punctuation
    * runs | whitespace runs, whitespace not counted). A deterministic
    * approximation of LLM token counts — ~1 merge-free upper bound —
    * without any vocabulary. RE2-compatible pattern so the DuckDB oracle
    * computes it identically. */
  val bpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0))).cast("long")

  /** Characters that are not letters, digits, or whitespace, as a fraction
    * of all characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
        length(text))

  /** Fraction of tokens that are English stopwords (tiny fixed list —
    * a quality signal, not NLP). */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(hits.cast("double") / tokenCount(text))
  }

  /** Mean token length — degenerate (very low/high) values flag boilerplate
    * or garbage. */
  def meanTokenLen(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
        tokenCount(text))

  /** Composite document quality score in [0,1]: length band + low
    * punctuation + stopword presence (a C4/Gopher-style rule-based filter,
    * reduced to deterministic arithmetic). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val lengthOk = when(n >= 10 && n <= 1000, lit(1.0))
      .when(n > 0, lit(0.5)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) <= 0.2, lit(1.0)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(text) >= 0.05, lit(1.0)).otherwise(lit(0.0))
    round((lengthOk + punctOk + stopOk) / 3.0, 4)
  }

  /** Tiny per-language marker-word lists for the n-gram-free language-ID
    * heuristic. Deterministic and SQL-expressible (counts of ` word `
    * occurrences in the padded, lowercased text). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of"),
    "de" -> Seq("der", "und", "ist", "das"),
    "fr" -> Seq("le", "et", "est", "les"),
    "es" -> Seq("el", "y", "es", "los"))

  private def markerHits(text: Column, words: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    words.map { w =>
      val token = s" $w "
      // occurrence count via length delta — pure string arithmetic, no UDF
      (length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(token), " "))).cast("double") / (token.length - 1)
    }.reduce(_ + _)
  }

  /** Language-ID heuristic: argmax of marker-word hits; 'und' when no
    * marker fires. Ties break by list order (en > de > fr > es). */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, ws) => l -> markerHits(text, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (l, s)) =>
      acc.when(s === best, lit(l))
    }.otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of the whitespace/case-normalized text —
    * the exact-dedup key (stable across engines, unlike hash/xxhash64
    * which are Spark-specific). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling-hash document fingerprint: one 64-bit value over the ordered
    * window-hash sequence (tokenize → per-window wrapping-polynomial hashes
    * via [[MinHash.shingleHashes]] → xxhash64 of the sequence). Unlike the
    * md5 [[fingerprint]] it is order-sensitive at shingle granularity and
    * runs entirely in fused codegen kernels — the fast dedup key when
    * cross-engine comparability is not needed (xxhash64 is Spark-specific). */
  def rollingFingerprint(text: Column, shingleSize: Int = 3): Column =
    xxhash64(MinHash.shingleHashes(
      split(lower(trim(text)), "\\s+"), shingleSize))

  /** Word n-gram shingles of the lowercased text; documents shorter than
    * `n` tokens collapse to a single whole-text shingle. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** n-gram Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0)).otherwise(
      size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)))

  /** Fraction of tokens that are repeats of an earlier token
    * (1 − distinct/total) — the token-level duplicate-content signal of
    * Gopher-style quality filtering. Zero for empty/single-token docs. */
  def dupTokenFrac(tokens: Column): Column =
    when(size(tokens) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(tokens)).cast("double") / size(tokens))

  /** Fraction of bigrams accounted for by the single most frequent bigram
    * — the repeated-phrase signal (a doc that is one sentence pasted 50
    * times scores ~1.0). Computed entirely WITHIN the row: sort the
    * bigram array, then count the longest equal-run with an `aggregate`
    * fold — a narrow map with zero shuffle (the relational
    * explode→groupBy→max formulation shuffles one row per bigram, which
    * at 100 TB is the corpus re-keyed; the oracle uses exactly that
    * formulation as an independent check). Zero when the doc has no
    * bigrams. */
  def topBigramFrac(tokens: Column): Column = {
    val bigrams = when(size(tokens) < 2,
        array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(tokens) - 2),
        i => concat_ws(" ", slice(tokens, i + 1, lit(2)))))
    // zero carries the full accumulator type (null string unifies with the
    // merge branches); the merge itself must NOT cast per step — a
    // per-element struct cast measured ~2.5× the whole fold
    val zero = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("best"))
    val best = aggregate(array_sort(bigrams), zero, (acc, b) => {
      val run = when(acc.getField("prev") === b,
        acc.getField("run") + 1L).otherwise(lit(1L))
      struct(b.as("prev"), run.as("run"),
        greatest(acc.getField("best"), run).as("best"))
    }).getField("best")
    // guard + divisor derive from the TOKEN count (n_bigrams = n_tok - 1),
    // so the bigram transform appears exactly once in the expression tree
    when(size(tokens) < 2, lit(0.0))
      .otherwise(best.cast("double") / (size(tokens) - 1))
  }
}
