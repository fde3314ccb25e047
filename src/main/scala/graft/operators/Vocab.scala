package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** BPE merge learning — the tokenizer-training step of an LLM data
  * pipeline: learn the first `nMerges` byte-pair-encoding merge rules
  * from a corpus.
  *
  * The scalable shape is the classic two-phase BPE trainer:
  *
  *  1. ONE corpus pass reduces the documents to a `(symbols, freq)`
  *     vocabulary table (whitespace pre-tokenization, the shared text
  *     recipe; each token starts as its character array). This is the
  *     only stage that sees corpus-sized data; the vocabulary is bounded
  *     by distinct-token count, not corpus length.
  *  2. Each merge round runs entirely over the cached vocabulary:
  *     count adjacent symbol pairs weighted by token frequency, pick the
  *     most frequent pair (ties → lexicographically smallest), apply it.
  *     The per-round driver collect is ONE row — the merge rule itself,
  *     i.e. the model being extracted, the same bounded-output exception
  *     as a k-means codebook.
  *
  * A round applies its rule with the classic greedy left-to-right
  * non-overlapping scan — "aaaa" under (a,a) becomes [aa, aa], "aaa"
  * becomes [aa, a] — implemented as ONE `aggregate` fold over the
  * symbol array: merge when the accumulator's last element is `l` and
  * the incoming symbol is `r`. A just-merged element can never re-merge
  * within the round (that would need `l+r = l`), so the fold IS the
  * greedy scan. Equivalently: within each run of consecutive matches,
  * even offsets merge — the closed form the `vocab_bpe_merges` DuckDB
  * oracle replays with gaps-and-islands window functions.
  */
object Vocab {

  /** `(syms, freq)` vocabulary: distinct lowercased whitespace tokens
    * with corpus frequencies, each exploded to its character array. */
  private def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .select(
        transform(sequence(lit(0), length(col("tok")) - 1),
          i => col("tok").substr(i + 1, lit(1))).as("syms"),
        col("freq"))

  /** Adjacent-pair counts over the vocabulary, weighted by token
    * frequency. The adjacent zip is slice+zip_with (NOT an index
    * sequence — a single-symbol token would make `sequence(0, -1)`
    * descend and element_at throw): both slices are empty for 1-symbol
    * tokens, so they contribute no pairs. */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = col("syms")
    val pairs = zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (l, r) => struct(l.as("l"), r.as("r")))
    vocab
      .select(explode(pairs).as("p"), col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Greedy left-to-right application of merge (l, r) to a symbol
    * array, as a single fold. */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === l && x === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** ENCODE a corpus with an already-learned merge list — the inference
    * half of the tokenizer ([[bpeMerges]] is the training half): each
    * document becomes its ordered BPE piece stream
    * `(idCol, pos, piece)`, `pos` 1-based over the whole document.
    *
    * The scalable shape mirrors training: merges are applied to the
    * DISTINCT-token vocabulary (bounded by vocabulary size — each rule is
    * one [[applyMerge]] fold, `nMerges` chained narrow maps), and the
    * corpus-sized token stream then just hash-joins `tok → syms` and
    * explodes. Encoding cost at 100 TB is one tokenize pass + one
    * vocabulary join — the per-token merge loop never touches
    * corpus-sized data. The per-document `row_number` runs over
    * document-sized partitions (a document's own piece stream must be
    * contiguous, so this is the natural partitioning, not a bottleneck).
    *
    * Merge rules apply in learned order, each with the same greedy
    * left-to-right non-overlapping scan as training — so
    * `bpeEncode(docs, rules-from-bpeMerges)` reproduces exactly the
    * vocabulary state the trainer ended at. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // the exploded token stream feeds BOTH the distinct-token vocabulary
    // and the final join; checkpoint it so the corpus tokenize runs once
    // (same lineage-truncation pattern as bpeMerges' per-round vocab)
    val toks = docs.select(col(idCol),
        posexplode(filter(split(lower(trim(col(textCol))), "\\s+"),
          t => t =!= "")).as(Seq("tok_idx", "tok")))
      .localCheckpoint(true)
    val encodedVocab = toks.select(col("tok")).distinct()
      .withColumn("syms",
        merges.foldLeft(
          transform(sequence(lit(0), length(col("tok")) - 1),
            i => col("tok").substr(i + 1, lit(1)))) {
          case (syms, (l, r)) => applyMerge(syms, l, r)
        })
    // global position = per-doc running piece offset + in-token index,
    // computed BEFORE the explode: the window sums size(syms) over
    // TOKEN-level rows, ~5× fewer rows through its sort than a
    // row_number over the exploded piece stream (measured 5.2 s → 0.9 s
    // at sf0.1) — and the sort key (tok_idx) is already unique per doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tok_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    toks.join(encodedVocab, "tok")
      .withColumn("__off", coalesce(sum(size(col("syms"))).over(w), lit(0)))
      .select(col(idCol), col("__off"),
        posexplode(col("syms")).as(Seq("sym_idx", "piece")))
      .withColumn("pos", (col("__off") + col("sym_idx") + 1).cast("long"))
      .select(col(idCol), col("pos"), col("piece"))
  }

  /** Persist a learned merge table ([[bpeMerges]] output) as the stored
    * tokenizer model — tiny (one row per merge), written as one file.
    * The tokenizer analog of the stored ANN indexes: train once, encode
    * many corpora against the artifact, never re-learn. */
  def writeMerges(merges: DataFrame, path: String): Unit =
    merges.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a [[writeMerges]] artifact back into the driver-side rule list
    * [[bpeEncode]] consumes, in round order. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("round").collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
      .toSeq

  /** Learn the first `nMerges` BPE merge rules. Output: one row per
    * round — `(round, left_sym, right_sym, pair_count)` — the merge
    * table a tokenizer trainer persists. Stops early when no pair is
    * left to merge. */
  def bpeMerges(docs: DataFrame, textCol: String = "text",
      nMerges: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = vocabulary(docs, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      top.headOption match {
        case Some(Row(l: String, r: String, cnt: Long)) =>
          merges += ((round.toLong, l, r, cnt))
          vocab = vocab
            .withColumn("syms", applyMerge(col("syms"), l, r))
            .localCheckpoint(true)
          round += 1
        case _ => exhausted = true
      }
    }
    merges.result().toDF("round", "left_sym", "right_sym", "pair_count")
  }
}
