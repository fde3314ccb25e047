package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics for training-data pipelines: TF-IDF
  * keyword extraction, exact vocabulary building, and a mergeable
  * count-min-sketch path for heavy-hitter estimation at corpus scale.
  *
  * Tokenization is the same whitespace recipe the rest of the text
  * family uses (`split(lower(trim(text)), "\\s+")`) so every result here
  * is reproducible in an independent SQL engine — the driver oracles
  * `text_tfidf` and `vocab_top_terms` row-for-row in DuckDB.
  *
  * '''100 TB shape.''' Everything flows through slim `(doc_id, term)` /
  * `(term, count)` rows — the document text is dropped at the explode, so
  * the shuffles never carry payloads. The term-frequency aggregation gets
  * map-side partial combine for free (hash aggregate); the document
  * frequency table is a second partial-combined aggregate whose output is
  * vocabulary-sized, orders of magnitude smaller than the token stream.
  * The tf⋈df join is left to AQE: at bench scale the vocab side
  * broadcasts, at 100 TB (vocabularies in the 10⁸ range) it degrades to a
  * shuffle join on `term` — never a cross or nested-loop. Nothing here
  * collects to the driver except the one scalar `docs.count()` (a
  * footer-only parquet count job). When even the exact vocabulary is too
  * hot to materialize, [[tokenSketch]] builds a count-min sketch instead:
  * fixed `O(width·depth)` memory per partition, merged associatively on
  * the driver — the classic mergeable-summary answer to heavy hitters
  * over an unbounded token stream.
  */
object Keywords {

  /** Slim `(idCol, term)` token stream: lowercased, whitespace-split,
    * empty tokens dropped. Matches the `token_histogram` oracle recipe,
    * so downstream counts are engine-portable. */
  def tokens(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")

  /** Per-document top-`k` terms by smoothed TF-IDF.
    *
    * `score = tf · (ln((N+1)/(df+1)) + 1)` — the smoothed-idf variant
    * (sklearn's `smooth_idf`): the +1s keep idf finite and positive even
    * for corpus-universal terms, so scores stay comparable across
    * documents. The score is rounded to 4 dp and ties rank by `term`, so
    * rank assignment is deterministic and engine-independent (the same
    * rounded-ordering trick the ANN oracles use).
    *
    * Output: `(doc_id, term, tf, df, score, rk)` with `rk ∈ [1, k]`.
    *
    * Plan shape: explode → hash-agg on `(doc, term)` (partial combine) →
    * vocab-sized df agg → AQE-chosen join on `term` → per-doc rank
    * window. Three shuffle boundaries, all over slim rows; no stage sees
    * document text after the explode. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val n = docs.count() // scalar; parquet footer count at scan level
    // the tf aggregate feeds BOTH the df aggregate and the scoring join —
    // scope-cache it so the corpus is tokenized and aggregated exactly
    // once (the minhash single-scan pattern)
    Dedup.withProjectionCache(tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))) { tf =>
      // df = number of documents containing the term: tf rows are already
      // distinct (doc, term), so a count per term IS the doc frequency —
      // no extra distinct pass.
      val dfTab = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val idf = log((lit(n) + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)
      val w = Window.partitionBy(idCol)
        .orderBy(col("score").desc, col("term"))
      tf.join(dfTab, "term")
        .withColumn("score", round(col("tf") * idf, 4))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .select(col(idCol), col("term"), col("tf"), col("df"),
          col("score"), col("rk"))
    }
  }

  /** Exact corpus vocabulary: one row per term with its document
    * frequency and total occurrence count, thresholded at `minDocFreq`.
    * Two chained partial-combined hash aggregates over slim rows; the
    * threshold filter sits on the aggregate output, so only the (tiny)
    * surviving vocabulary flows downstream. */
  def vocabulary(docs: DataFrame, minDocFreq: Long = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("doc_freq"), sum("tf").as("total_count"))
      .filter(col("doc_freq") >= minDocFreq)

  /** PMI collocation mining (Church & Hanks' pointwise mutual
    * information over adjacent bigrams): the corpus's top-`k` word
    * pairs that co-occur far more than their unigram frequencies
    * predict — the classic multi-word-expression / named-entity
    * candidate list a vocabulary pipeline feeds to its tokenizer.
    * `PMI(a,b) = ln( p(ab) / (p(a)·p(b)) )` with `p(ab) = c(ab)/M`
    * (bigram mass) and `p(a) = c(a)/N` (token mass), mil-scaled as ONE
    * `floor(ln(ratio)·10⁶)` on the ratio `c(ab)·N² / (M·c(a)·c(b))`.
    * Both engines build numerator and denominator as LEFT-ASSOCIATIVE
    * double products of the integer counts: exact below 2⁵³, and above
    * it IEEE rounding is order-deterministic, so the two engines still
    * compute the identical double (never a BIGINT overflow at web-scale
    * token counts — N² alone passes 2⁶³ around N = 3·10⁹). The only
    * cross-engine boundary is the accepted ln-ulp class. `minCount`
    * suppresses the classic PMI pathology (hapax pairs score highest).
    *
    * Plan: one tokenize feeding a unigram and a bigram aggregate (both
    * map-side combined, vocab-sized outputs), 1-row totals broadcast,
    * top-k as a distributed ranked take. */
  def pmiCollocations(docs: DataFrame, k: Int = 30, minCount: Long = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val base = docs.select(split(lower(trim(col(textCol))), "\\s+").as("__w"))
    Dedup.withProjectionCache(base)(pmiRanked(_, k, minCount))
  }

  /** The count-and-rank stage of [[pmiCollocations]] over the tokenized
    * `(__w)` relation — split out so the plan pin can see the shape the
    * scope cache's trailing checkpoint hides. */
  private[graft] def pmiRanked(base: DataFrame, k: Int,
      minCount: Long): DataFrame = {
    val uni = base.select(explode(col("__w")).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    // the bigram MASS (M) comes from the unfiltered pair counts —
    // thresholding before the total would bias every p(ab) upward
    val biAll = base.filter(size(col("__w")) >= 2)
      .select(explode(expr(
        """transform(sequence(2, size(__w)),
          |  i -> struct(element_at(__w, i - 1) AS l,
          |              element_at(__w, i) AS r))""".stripMargin)).as("b"))
      .select(col("b.l").as("l"), col("b.r").as("r"))
      .filter(col("l") =!= "" && col("r") =!= "")
      .groupBy(col("l"), col("r")).agg(count(lit(1)).as("n_pair"))
    val bi = biAll.filter(col("n_pair") >= minCount)
    val totals = uni.agg(sum(col("c")).as("n"))
      .crossJoin(biAll.agg(sum(col("n_pair")).as("m")))
    val scored = bi
      .join(broadcast(uni.select(col("t").as("l"), col("c").as("cl"))), "l")
      .join(broadcast(uni.select(col("t").as("r"), col("c").as("cr"))), "r")
      .crossJoin(broadcast(totals))
      .select(col("l"), col("r"), col("n_pair"),
        floor(log((col("n_pair").cast("double") * col("n") * col("n")) /
          (col("m").cast("double") * col("cl") * col("cr"))) * 1e6)
          .cast("long").as("pmi_mil"))
    val top = scored
      .orderBy(col("pmi_mil").desc, col("l"), col("r"))
      .limit(k)
    val w = Window.orderBy(col("pmi_mil").desc, col("l"), col("r"))
    top.withColumn("rk", row_number().over(w).cast("long"))
  }

  /** RAKE keyword extraction (Rose et al., "Automatic Keyword Extraction
    * from Individual Documents", 2010) at corpus level: candidate
    * phrases are the maximal runs of non-stopword tokens (stopwords and
    * empty tokens delimit), each word scores `degree / frequency` over
    * all candidate-phrase occurrences — `frequency` = the word's
    * occurrence count inside candidates, `degree` = the summed length of
    * every candidate occurrence containing it (co-occurrence including
    * self) — and a phrase scores the sum of its member words' scores
    * (with multiplicity). Returns the corpus's top-`k` distinct phrases:
    * `(phrase, score_mil, n_words, occurrences, rk)`.
    *
    * Integer-exact scoring: the word score is `(degree·10⁶) div
    * frequency` (ONE truncating division on integer counts — the
    * PageRank lattice discipline), and phrase scores are integer sums of
    * those, so ranking is engine-portable with no float-sum drift and
    * the whole extraction replays in SQL. Rose's per-document variant
    * computes the same statistics within one document; corpus-level
    * co-occurrence is the datacard/vocabulary-mining form.
    *
    * Plan shape at scale: one tokenize; phrase assembly is the
    * gaps-and-islands trick (`pos − row_number` per doc — a per-doc
    * window sort, spill-safe, no corpus-wide partition); word stats are
    * one vocab-sized aggregate broadcast back; the top-k is a
    * distributed TakeOrderedAndProject, never a global sort. The
    * stopword list is caller-supplied — RAKE's delimiter inventory is a
    * domain decision (function words plus domain-ubiquitous terms). */
  def rakeKeywords(docs: DataFrame, stopwords: Seq[String], k: Int = 30,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    val toks = docs
      .select(col(idCol).as("id"),
        posexplode(split(lower(trim(col(textCol))), "\\s+")))
      .withColumnRenamed("col", "tok")
    val wIsl = Window.partitionBy(col("id")).orderBy(col("pos"))
    val wLen = Window.partitionBy(col("id"), col("grp"))
    val member = toks
      .filter(col("tok") =!= "" && !col("tok").isInCollection(stopwords))
      .withColumn("grp", col("pos") - row_number().over(wIsl))
      .withColumn("plen", count(lit(1)).over(wLen))
    // the member relation feeds both the word statistics and the phrase
    // assembly — scope-cache so the corpus is tokenized and windowed once
    Dedup.withProjectionCache(member)(rakeRanked(_, k))
  }

  /** The score-and-rank stage of [[rakeKeywords]] over the phrase-member
    * relation `(id, grp, pos, tok, plen)` — split out so the plan pin
    * can see the shape the scope cache's trailing checkpoint hides:
    * vocab-sized word scores broadcast back onto the members, phrase
    * assembly per (doc, island), and a distributed ranked take. */
  private[graft] def rakeRanked(m: DataFrame, k: Int): DataFrame = {
    val wordScores = m.groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("tok"), expr("(deg * 1000000L) div freq").as("w_mil"))
    val occ = m.join(broadcast(wordScores), "tok")
      .groupBy(col("id"), col("grp"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("phrase"),
        sum(col("w_mil")).as("score_mil"),
        count(lit(1)).as("n_words"))
    // score/n_words are functions of the phrase string (same words →
    // same stats), so min() just collapses the duplicates exactly
    val top = occ.groupBy(col("phrase"))
      .agg(count(lit(1)).as("occurrences"),
        min(col("score_mil")).as("score_mil"),
        min(col("n_words")).as("n_words"))
      .orderBy(col("score_mil").desc, col("phrase"))
      .limit(k)
    val w = Window.orderBy(col("score_mil").desc, col("phrase"))
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("phrase"), col("score_mil"), col("n_words"),
        col("occurrences"), col("rk"))
  }

  // ---- stored inverted index -----------------------------------------------

  /** Executor-side md5 term bucket (32 md5 bits mod `nBuckets`) — must
    * agree with the driver twin [[bucketOf]], which selects probe
    * partitions without touching data. Engine-portable (the oracle
    * recomputes it in SQL when needed). */
  private def bucketCol(term: Column, nBuckets: Int): Column =
    (conv(substring(md5(term), 1, 8), 16, 10).cast("long") % nBuckets)
      .cast("int")

  /** Driver twin of [[bucketCol]]. */
  def bucketOf(term: String, nBuckets: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % nBuckets).toInt
  }

  /** Write a term-bucketed inverted index: posting rows `(term, doc_id,
    * tf, dl)` laid out `partitionBy(bucket)` with one file per bucket
    * (the repartition feeds the writer exactly the partition split it
    * wants), so a query term's postings are ONE directory read and every
    * other bucket is partition-pruned at probe time — the same
    * stored-artifact amortization as the LSH/IVF indexes: build once,
    * probe many.
    *
    * Each posting carries its document's token length `dl` (denormalized
    * at write time — a slim `(doc, dl)` join against the same cached tf
    * aggregate), and a one-row `_stats` sidecar under the index root
    * records the exact corpus totals `(n_docs, total_tokens)`. Together
    * these make the index self-contained for BM25: [[bm25FromIndex]]
    * scores from the pruned postings read alone — df per query term IS
    * the posting count inside its bucket, dl rides on the posting row,
    * and N/avgdl come from the sidecar — so query cost is independent of
    * corpus size. (The `_stats` directory is invisible to
    * `spark.read.parquet(path)`: underscore-prefixed paths are filtered
    * by the file index, the `_SUCCESS`-marker convention.) */
  def writeInvertedIndex(docs: DataFrame, path: String, nBuckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val nDocs = docs.count() // parquet footer count
    // eager checkpoint, not persist: tf self-joins with its own dl
    // aggregate below — the plan shape Spark 4.1.2's cache substitution
    // can mis-bind after the count() action above (see
    // Dedup.withProjectionCache); the checkpoint truncates lineage so
    // there is nothing to substitute
    val tf = tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    try {
      val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
      tf.join(dl, Seq(idCol))
        .withColumn("bucket", bucketCol(col("term"), nBuckets))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
      val tot = tf.agg(coalesce(sum("tf"), lit(0L))).head().getLong(0)
      // written LAST: gate index reuse on _stats/_SUCCESS, which only
      // exists once the whole artifact (postings + sidecar) is complete.
      // n_buckets is recorded so appendToInvertedIndex can refuse a
      // mismatched bucketing (postings in wrong directories would be
      // invisible to the probe's partition pruning — silent recall loss)
      spark.range(1)
        .select(lit(nDocs).as("n_docs"), lit(tot).as("total_tokens"),
          lit(nBuckets).as("n_buckets"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
    } finally Dedup.releaseCheckpoint(tf)
  }

  /** O(batch) incremental maintenance for [[writeInvertedIndex]] — the
    * retrieval twin of `IvfIndex.append`: tokenize ONLY the new
    * documents, append their posting rows into the existing `bucket=`
    * partition directories, and roll the `_stats` sidecar forward.
    * Resident postings are never read or rewritten, and the probe path
    * ([[bm25FromIndex]] / the search functions) is untouched.
    *
    * Append ≡ full rebuild EXACTLY, not approximately: every BM25
    * input is batch-decomposable — a posting row `(term, doc, tf, dl)`
    * depends only on its own document's text, per-term `df` is the
    * posting count inside the term's bucket (old + new rows), and
    * `N`/`avgdl` come from the additive sidecar totals. So the indexed
    * scores after an append hash-match the full-corpus oracle verbatim
    * (`text_bm25_index_append`), the same equivalence contract the IVF
    * append pins.
    *
    * Caller contract: batch ids must be NEW (an id present in the
    * resident index would double its postings — dedupe upstream, the
    * incremental-dedup operators exist for exactly this). The bucket
    * count is read from the sidecar and must match the build's; a
    * mismatch is refused loudly (mis-bucketed postings would be
    * invisible to partition pruning — silent recall loss). Writes are
    * ordered postings-then-stats; a crash between them leaves scores
    * on the stale (smaller) totals — re-run the append idempotently
    * only after removing the partial batch files, or rebuild (the
    * `_stats` overwrite is the commit point, mirroring the build's
    * write-sidecar-last discipline). */
  def appendToInvertedIndex(newDocs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    val st = spark.read.parquet(s"$path/_stats").head()
    val nBuckets = st.getAs[Int]("n_buckets")
    val nNew = newDocs.count()
    val tf = tokens(newDocs, idCol, textCol)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // see writeInvertedIndex
    try {
      val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
      tf.join(dl, Seq(idCol))
        .withColumn("bucket", bucketCol(col("term"), nBuckets))
        .repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(path)
      val tot = tf.agg(coalesce(sum("tf"), lit(0L))).head().getLong(0)
      spark.range(1)
        .select(lit(st.getAs[Long]("n_docs") + nNew).as("n_docs"),
          lit(st.getAs[Long]("total_tokens") + tot).as("total_tokens"),
          lit(nBuckets).as("n_buckets"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
    } finally Dedup.releaseCheckpoint(tf)
  }

  /** BM25 top-`k` from a stored [[writeInvertedIndex]] index — the
    * production retrieval path: identical scores to [[bm25TopDocs]]
    * (same formula over the same exact integer tf/df/dl/N inputs), but
    * the only data touched is the query terms' bucket directories
    * (`PartitionFilters`, PlanSpec-pinned) plus the one-row `_stats`
    * sidecar. No corpus scan, no per-query tokenize: df per term is a
    * count over the pruned postings (postings are distinct `(doc,
    * term)` rows), dl is on the posting row, and the final score is the
    * same fixed-`queryTerms`-order sum of per-term weights, so the
    * ranking is engine-reproducible and the [[bm25TopDocs]] oracle SQL
    * verifies this path verbatim. */
  def bm25FromIndex(spark: SparkSession, path: String,
      queryTerms: Seq[String], k: Int = 20, k1: Double = 1.2,
      b: Double = 0.75, nBuckets: Int = 64,
      idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val st = spark.read.parquet(s"$path/_stats").head()
    val n = st.getAs[Long]("n_docs")
    val avgdl = st.getAs[Long]("total_tokens").toDouble / n
    val qTerms = queryTerms.distinct
    val buckets = qTerms.map(bucketOf(_, nBuckets)).distinct
    val postings = spark.read.parquet(path)
      .filter(col("bucket").isin(buckets.map(Int.box): _*))
      .filter(col("term").isin(qTerms: _*))
    val dfTab = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val wExpr =
      log((lit(n.toDouble) - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0)) *
      (col("tf").cast("double") /
        (col("tf").cast("double") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) *
            (col("dl").cast("double") / lit(avgdl)))))
    val perTerm = postings.join(broadcast(dfTab), "term")
      .withColumn("w", wExpr)
    val score = queryTerms
      .map(t => coalesce(max(when(col("term") === t, col("w"))), lit(0.0)))
      .reduce(_ + _)
    perTerm.groupBy(col(idCol))
      .agg(round(score, 4).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Conjunctive (AND-of-terms) search against a stored inverted index:
    * the driver twin maps query terms to their buckets, the scan reads
    * ONLY those partition directories (`PartitionFilters` — pinned by
    * PlanSpec), and a doc qualifies when it carries ALL the terms.
    * Postings are distinct `(doc, term)` rows, so the per-doc row count
    * IS the matched-term count. Ranked by summed tf, id tiebreak, so
    * rank assignment is engine-independent. */
  def searchInvertedIndex(spark: SparkSession, path: String,
      terms: Seq[String], k: Int = 20, nBuckets: Int = 64,
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val qTerms = terms.distinct
    val buckets = qTerms.map(bucketOf(_, nBuckets)).distinct
    spark.read.parquet(path)
      .filter(col("bucket").isin(buckets.map(Int.box): _*))
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("tf_sum"))
      .filter(col("n_terms") === qTerms.length)
      .select(col(idCol), col("tf_sum"))
      .orderBy(col("tf_sum").desc, col(idCol))
      .limit(k)
  }

  /** Write a POSITIONAL term-bucketed inverted index: posting rows
    * `(term, doc_id, positions)` with the sorted 0-based token positions
    * of each term occurrence — the layout phrase and proximity queries
    * need. Same bucket partitioning and one-file-per-bucket write as
    * [[writeInvertedIndex]]; postings are ~|occurrences| ints heavier
    * than the tf rows, still payload-free. */
  def writePositionalIndex(docs: DataFrame, path: String, nBuckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    positionalPostings(docs, idCol, textCol, nBuckets)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    // bucket-count sidecar written LAST (the _stats discipline):
    // appendToPositionalIndex reads it back, so a mis-bucketed append
    // is unrepresentable
    docs.sparkSession.range(1).select(lit(nBuckets).as("n_buckets"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
  }

  private def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String, nBuckets: Int): DataFrame =
    docs.select(col(idCol),
        posexplode(split(lower(trim(col(textCol))), "\\s+")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("bucket", bucketCol(col("term"), nBuckets))
      .repartition(col("bucket"))

  /** O(batch) maintenance for [[writePositionalIndex]] — positional
    * postings are per-document (a term's position list never references
    * another document), so appending the batch's rows into the existing
    * `bucket=` dirs IS a full rebuild, exactly; phrase/proximity probes
    * are untouched. Bucket count comes from the `_meta` sidecar, never
    * from an argument. Caller contract: batch ids must be new (the
    * [[appendToInvertedIndex]] contract). */
  def appendToPositionalIndex(newDocs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val nBuckets = newDocs.sparkSession.read.parquet(s"$path/_meta")
      .head().getAs[Int]("n_buckets")
    positionalPostings(newDocs, idCol, textCol, nBuckets)
      .write.mode("append").partitionBy("bucket").parquet(path)
  }

  /** Exact-phrase search against a [[writePositionalIndex]] index: the
    * i-th phrase word's positions shift by −i, and a document matches
    * where the shifted position lists intersect — `|∩ᵢ (posᵢ − i)|` is
    * exactly the phrase occurrence count (overlapping occurrences
    * included, standard positional-query semantics). The scan reads only
    * the phrase terms' bucket directories (partition-pruned like the
    * conjunctive probe); the n-way doc join carries slim
    * `(doc, positions)` rows. Ranked by occurrence count, id tiebreak. */
  def phraseSearch(spark: SparkSession, path: String, phrase: Seq[String],
      k: Int = 20, nBuckets: Int = 64, idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val buckets = phrase.distinct.map(bucketOf(_, nBuckets)).distinct
    val base = spark.read.parquet(path)
      .filter(col("bucket").isin(buckets.map(Int.box): _*))
      .filter(col("term").isin(phrase.distinct: _*))
    val rels = phrase.zipWithIndex.map { case (t, i) =>
      base.filter(col("term") === t)
        .select(col(idCol),
          (if (i == 0) col("positions")
           else transform(col("positions"), p => p - i)).as(s"__pos_$i"))
    }
    val joined = rels.reduce(_.join(_, idCol))
    val inter = (0 until phrase.length)
      .map(i => col(s"__pos_$i"))
      .reduce((a, b) => array_intersect(a, b))
    joined
      .select(col(idCol), size(inter).cast("long").as("n_occurrences"))
      .filter(col("n_occurrences") > 0)
      .orderBy(col("n_occurrences").desc, col(idCol))
      .limit(k)
  }

  /** Unigram corpus-frequency document scoring — the log-free LM-quality
    * proxy: per document, its token count, the sum of each token's
    * corpus-wide occurrence count, and their ratio in mils. Documents of
    * corpus-rare tokens score low, boilerplate built from corpus-hot
    * tokens scores high — the unigram-likelihood signal quality-filter
    * pipelines threshold on, kept integer-exact instead of log-space:
    * libm `log` is not bit-identical across engines, while the count sum
    * is a BIGINT and the single closing division+floor is two IEEE ops.
    *
    * Plan shape: ONE tokenize of the corpus (scope-cached slim
    * `(doc, term)` rows) feeds both the vocabulary aggregate and the
    * scoring join; the join key is the term, the vocabulary is
    * corpus-vocab-sized (AQE broadcasts it until it outgrows the
    * threshold, then it is a hash join on the term — the shuffle you
    * want). No stage sees document text after the explode. */
  def corpusFrequencyScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Dedup.withProjectionCache(tokens(docs, idCol, textCol)) { toks =>
      val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      toks.join(vocab, "term")
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_toks"), sum(col("cnt")).as("sum_freq"))
        .withColumn("mean_freq_mils",
          floor(col("sum_freq") * lit(1000.0) / col("n_toks")))
    }

  /** Bigram-backoff surprisal scoring — the KenLM-shaped quality filter
    * (CCNet scores documents by LM perplexity and drops the tail)
    * re-expressed in INTEGER-EXACT arithmetic so the score is
    * reproducible bit-for-bit in any engine. A float log-prob sum is
    * summation-order-dependent and engine-varying; instead each token
    * position contributes `ilog2(a div b)` bits — integer division, then
    * the bit-length of the quotient — which only touches exact integer
    * counts:
    *
    *   - bigram seen in the model:  `ilog2(c(prev) div c(prev,cur))`
    *     (≈ the conditional surprisal −log2 P(cur|prev))
    *   - bigram unseen, unigram seen: `backoffBits + ilog2(N div c(cur))`
    *     (stupid-backoff to the unigram with a fixed penalty)
    *   - token unseen (OOV): `oovBits + ilog2(N)`
    *   - position 1 has no context: unigram surprisal, no penalty
    *
    * `model` supplies the counts (a held-out or reference slice); `score`
    * is the corpus being rated. Output per doc:
    * `(idCol, n_tokens, total_bits, bits_per_token)` — low bits/token ≈
    * predictable, in-distribution text; high ≈ rare/garbled.
    *
    * Plan shape at scale: the model side is scanned once (cached
    * projection) into vocab-sized unigram/bigram count tables with
    * map-side partial aggregation; the score side joins them on token
    * keys — skewed by construction (stopwords), which is exactly the
    * AQE-skew-join / broadcast-when-vocab-fits case, and the per-doc
    * reduce is an integer hash-agg. No stage carries document text past
    * the explode, and nothing in the pipeline is float until the final
    * per-row `bits/tokens` division. */
  def surprisalScore(score: DataFrame, model: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      backoffBits: Int = 4, oovBits: Int = 8): DataFrame =
    Dedup.withProjectionCache(positionedTokens(model, idCol, textCol)) { mp =>
      val uni = mp.groupBy(col("cur")).agg(count(lit(1)).as("c_uni"))
      val bi = mp.filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c_bi"))
      val tot = mp.agg(count(lit(1)).as("n_total"))
      surprisalAgainst(score, uni, bi, tot, backoffBits, oovBits,
        idCol, textCol)
    }

  /** `(id, pos, cur, prev)` token positions shared by the surprisal
    * train and score sides. */
  private def positionedTokens(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("__t"))
      .select(col(idCol), explode(transform(sequence(lit(1), size(col("__t"))),
        i => struct(i.cast("long").as("pos"),
          element_at(col("__t"), i).as("cur"),
          when(i > lit(1), element_at(col("__t"), i - 1)).as("prev")))).as("__p"))
      .select(col(idCol), col("__p.pos").as("pos"),
        col("__p.cur").as("cur"), col("__p.prev").as("prev"))

  /** The scoring join shared by [[surprisalScore]] (counts derived
    * inline) and [[surprisalFromModel]] (counts read from a stored
    * model): identical arithmetic over whatever `(cur, c_uni)` /
    * `(prev, cur, c_bi)` / one-row `(n_total)` relations arrive. */
  private def surprisalAgainst(score: DataFrame, uni: DataFrame,
      bi: DataFrame, tot: DataFrame, backoffBits: Int, oovBits: Int,
      idCol: String, textCol: String): DataFrame = {
    def ilog2(x: Column): Column = (length(bin(x)) - 1).cast("long")
    val bits =
      when(col("c_bi").isNotNull, ilog2(expr("c_prev div c_bi")))
        .when(col("c_uni").isNotNull && col("pos") > 1,
          lit(backoffBits.toLong) + ilog2(expr("n_total div c_uni")))
        .when(col("c_uni").isNotNull, ilog2(expr("n_total div c_uni")))
        .otherwise(lit(oovBits.toLong) + ilog2(col("n_total")))
    positionedTokens(score, idCol, textCol)
      .crossJoin(broadcast(tot)) // one-row total, broadcast by design
      .join(uni, Seq("cur"), "left")
      .join(uni.select(col("cur").as("prev"), col("c_uni").as("c_prev")),
        Seq("prev"), "left")
      .join(bi, Seq("prev", "cur"), "left")
      .withColumn("__bits", bits)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__bits")).as("total_bits"),
        round(sum(col("__bits")) * lit(1.0) / count(lit(1)), 4)
          .as("bits_per_token"))
  }

  /** Persist the bigram-backoff model [[surprisalScore]] derives, as a
    * stored artifact — the KenLM production shape: TRAIN ONCE over the
    * reference slice, then score every incoming batch against the
    * stored counts without ever re-reading the model corpus. Layout:
    * `uni/` `(cur, c_uni)`, `bi/` `(prev, cur, c_bi)`, and a one-row
    * `_stats` `(n_total)` written LAST (reuse gates on
    * `_stats/_SUCCESS`, the write-sidecar-last discipline every stored
    * index here follows). The tables are vocabulary-sized — orders of
    * magnitude below the corpus — so scoring cost is batch-dominated. */
  def writeNgramModel(model: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = model.sparkSession
    val mp = positionedTokens(model, idCol, textCol)
      .localCheckpoint(true) // see writeInvertedIndex
    try {
      mp.filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c_bi"))
        .write.mode("overwrite").parquet(s"$path/bi")
      mp.groupBy(col("cur")).agg(count(lit(1)).as("c_uni"))
        .write.mode("overwrite").parquet(s"$path/uni")
      val tot = mp.count()
      spark.range(1).select(lit(tot).as("n_total"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
    } finally Dedup.releaseCheckpoint(mp)
  }

  /** Score a batch against a STORED [[writeNgramModel]] artifact —
    * output identical to [[surprisalScore]] trained on the same model
    * slice (the equivalence `text_surprisal_stored` hash-checks with
    * the inline query's own oracle). The model corpus text is never
    * touched: the joins read vocab-sized count tables, and the skewed
    * token keys (stopwords) hit the same AQE-skew/broadcast handling
    * as the inline form. */
  def surprisalFromModel(spark: SparkSession, path: String,
      score: DataFrame, backoffBits: Int = 4, oovBits: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    surprisalAgainst(score,
      spark.read.parquet(s"$path/uni"),
      spark.read.parquet(s"$path/bi"),
      spark.read.parquet(s"$path/_stats"),
      backoffBits, oovBits, idCol, textCol)

  /** Lucene-style BM25 document scoring for a fixed query-term set — the
    * retrieval primitive over the same token recipe:
    * `score(d) = Σ_t idf(t) · tf/(tf + k1·(1-b+b·dl/avgdl))` with
    * `idf = ln((N-df+0.5)/(df+0.5)+1)`.
    *
    * Deterministic cross-engine by construction: the per-`(doc, term)`
    * weight is per-row float math over exact integer inputs (tf, df, dl,
    * and the avgdl ratio of two integers), and the final score adds the
    * per-term weights in FIXED `queryTerms` order via conditional
    * aggregates over singleton groups — never a float reduction whose
    * summation order the engine chooses (the lesson the centroids oracle
    * taught). Ties rank by rounded score then id.
    *
    * Plan shape: the cached token projection feeds the doc-length
    * aggregate and the (query-terms-only) tf aggregate — one corpus
    * scan; the df table is query-term-sized and broadcast; the dl join
    * shuffles slim `(doc, dl)` rows. Returns the top `k` docs as
    * `(idCol, bm25)`. */
  def bm25TopDocs(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val n = docs.count()
    Dedup.withProjectionCache(tokens(docs, idCol, textCol)) { toks =>
      val tot = toks.agg(count(lit(1))).head().getLong(0)
      val avgdl = tot.toDouble / n // ratio of exact integers: portable
      val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
      val tf = toks.filter(col("term").isin(queryTerms: _*))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      val dfTab = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val wExpr =
        log((lit(n.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)) *
        (col("tf").cast("double") /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) *
              (col("dl").cast("double") / lit(avgdl)))))
      val perTerm = tf.join(broadcast(dfTab), "term")
        .join(dl, Seq(idCol))
        .withColumn("w", wExpr)
      // fixed-order sum of per-term weights (each max() is over a
      // singleton group — (doc, term) rows are unique)
      val score = queryTerms
        .map(t => coalesce(max(when(col("term") === t, col("w"))), lit(0.0)))
        .reduce(_ + _)
      perTerm.groupBy(col(idCol))
        .agg(round(score, 4).as("bm25"))
        .orderBy(col("bm25").desc, col(idCol))
        .limit(k)
    }
  }

  /** Count-min sketch over the token stream — the sub-linear scale path
    * when the exact vocabulary is too large to materialize. Returns the
    * serialized sketch (deserialize with
    * `org.apache.spark.util.sketch.CountMinSketch.readFrom`). The sketch
    * is built per-partition in fixed memory and merged associatively, so
    * the only thing that moves is `O(width·depth)` counters per
    * partition — no token shuffle at all. Guarantees (eps, confidence):
    * estimate ≥ true count, and ≤ true + eps·total with probability ≥
    * confidence — pinned by KeywordsSpec against the exact counts. */
  def tokenSketch(docs: DataFrame, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42,
      idCol: String = "doc_id", textCol: String = "text"): Array[Byte] =
    tokens(docs, idCol, textCol)
      .select(count_min_sketch(col("term"), lit(eps), lit(confidence),
        lit(seed)).as("sk"))
      .head().getAs[Array[Byte]](0)

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of
    * independently-ranked retrieval lists:
    * `rrf(d) = Σ_lists 1/(rrfK + rank_list(d))`, ranks 1-based within
    * each list, docs absent from a list contribute 0 for it. Fusing a
    * BM25 lexical ranking with an embedding-ANN ranking is the standard
    * hybrid-search scorer in modern retrieval stacks — RRF needs no
    * score calibration across lists because only ranks enter.
    *
    * Each input is `(df, idCol, scoreCol)`; `scoreCol` must already be
    * rounded to its oracle precision (the producers here — [[bm25TopDocs]],
    * `Similarity.bruteForceTopK`/`lshTopK` — all emit 4-dp scores), so
    * `row_number` over `(score DESC, id)` assigns the same rank in any
    * engine. The fused score is a fixed-order sum of ≤ `lists.size`
    * per-row rational terms — never a data-dependent float reduction.
    * Score column names must be distinct: the output carries one
    * `rank_<scoreCol>` column per list (null where absent) plus `rrf`.
    *
    * '''100 TB shape.''' Fusion runs over CANDIDATE LISTS, not the
    * corpus: each input is already a top-`kEach` result (BM25 from the
    * stored inverted index, ANN from a stored LSH/IVF index), so every
    * join and rank window here touches `O(Σ kEach)` rows regardless of
    * corpus size — the single-partition windows are deliberate. */
  def rrfFuse(lists: Seq[(DataFrame, String, String)], k: Int = 20,
      rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val scoreCols = lists.map(_._3)
    require(scoreCols.distinct.size == scoreCols.size,
      s"score column names must be distinct, got $scoreCols")
    val ranked = lists.map { case (df, idC, scoreC) =>
      val w = Window.orderBy(col(scoreC).desc, col(idC))
      df.select(col(idC).cast("long").as("id"),
        row_number().over(w).cast("long").as(s"rank_$scoreC"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val rrf = scoreCols
      .map(c => coalesce(lit(1.0) / (lit(rrfK.toDouble) + col(s"rank_$c")),
        lit(0.0)))
      .reduce(_ + _)
    joined
      .select(col("id") +: scoreCols.map(c => col(s"rank_$c")) :+
        round(rrf, 6).as("rrf"): _*)
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }

  // ---- Naive Bayes text classification -------------------------------------

  /** Trained multinomial Naive Bayes model: `terms(term, label,
    * ll_mil)` holds the add-1-smoothed log-likelihood of each SEEN
    * (term, label) pair and `labels(label, prior_mil, miss_mil)` the
    * log prior plus the smoothed likelihood of a vocabulary term the
    * label never saw. Everything is a micro-scaled LONG
    * (`floor(ln(·)·10⁶)` — floor, not round: round's half-away vs
    * half-up disagree on negatives across engines), so SCORING is pure
    * integer summation: argmax decisions are exact and
    * engine-portable, never one ulp of float drift away from flipping
    * a class. One residual boundary remains at TRAINING time, the same
    * accepted class as every mil-scaled `floor(ln)` surface here: JVM
    * `Math.log` and another engine's `ln` may differ in the last ulp,
    * so when `ln(x)·10⁶` lands within an ulp of an integer the floored
    * longs can diverge by 1 across engines — a near-tie argmax one
    * micro-unit wide could then flip. The model arguments are exact
    * rationals of small integer counts, so such landings are
    * measure-zero coincidences, not systematic; a shared deterministic
    * fixed-point log would close it at the cost of a bespoke routine. */
  final case class NbModel(terms: DataFrame, labels: DataFrame,
      charNgrams: Seq[Int] = Nil)

  /** One (row → exploded feature) projection shared by NB train and
    * score — the model's `charNgrams` rides along in [[NbModel]] so the
    * two sides can never featurize differently. Word mode (empty
    * `charNgrams`): whitespace tokens of the lowercased text, the
    * multinomial baseline. Char-n-gram mode: every n-gram of each
    * requested size slid over the WHOLE normalized string (spaces
    * included — word-boundary context is exactly what distinguishes
    * orthographies), a text shorter than n contributing itself whole.
    * This is the fastText/CCNet langid feature space: vocabulary
    * generalizes to unseen words because n-grams see orthography, not
    * word identity. Closed-form replayable (substring arithmetic), so
    * the cross-engine oracle can hash the full model-and-score path. */
  private def nbTerms(df: DataFrame, textCol: String,
      charNgrams: Seq[Int], keep: Column*): DataFrame = {
    val base = df.withColumn("__t", lower(trim(col(textCol))))
    val featured =
      if (charNgrams.isEmpty)
        base.select(keep :+ explode(split(col("__t"), "\\s+")).as("term"): _*)
      else {
        require(charNgrams.forall(n => n >= 1 && n <= 16),
          s"char n-gram sizes must be in [1, 16], got $charNgrams")
        val grams = charNgrams.map { n =>
          s"""CASE WHEN length(__t) < $n THEN array(__t)
             |ELSE transform(sequence(1, length(__t) - ${n - 1}),
             |  i -> substring(__t, i, $n)) END""".stripMargin
        }.mkString("concat(", ", ", ")")
        base.select(keep :+ explode(expr(grams)).as("term"): _*)
      }
    featured.filter(col("term") =!= "")
  }

  /** Train the classic curation classifier (fastText-style quality /
    * language routing, CCNet's filtering stage — here as multinomial
    * NB, the public-knowledge baseline those systems compare against):
    * ONE tokenize pass, one (term, label) count aggregate (map-side
    * combined), and label-sized side relations. At 100 TB the heavy
    * relation is the token count — everything derived from it is
    * vocab- or label-sized. */
  def naiveBayesTrain(docs: DataFrame, textCol: String = "text",
      labelCol: String = "label", idCol: String = "doc_id",
      charNgrams: Seq[Int] = Nil): NbModel = {
    val toks = nbTerms(docs, textCol, charNgrams, col(labelCol).as("label"))
    val counts = toks.groupBy(col("term"), col("label"))
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val vSize = counts.agg(count_distinct(col("term")).as("v"))
    val totals = counts.groupBy(col("label")).agg(sum(col("c")).as("t"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val priors = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
    val labels = priors.crossJoin(broadcast(nDocs))
      .join(totals, "label").crossJoin(broadcast(vSize))
      .select(col("label"),
        floor(log(col("nd").cast("double") / col("n")) * 1e6)
          .cast("long").as("prior_mil"),
        floor(log(lit(1.0) / (col("t") + col("v")))  * 1e6)
          .cast("long").as("miss_mil"))
      .localCheckpoint(true)
    val terms = counts.join(totals, "label").crossJoin(broadcast(vSize))
      .select(col("term"), col("label"),
        floor(log((col("c") + lit(1)).cast("double") / (col("t") + col("v")))
          * 1e6).cast("long").as("ll_mil"))
      .localCheckpoint(true)
    Dedup.releaseCheckpoint(counts)
    NbModel(terms, labels, charNgrams)
  }

  /** Score documents against a trained [[NbModel]]: per document,
    * per label, the integer sum of token log-likelihoods (seen pair →
    * `ll_mil`, vocabulary term unseen under this label → the label's
    * `miss_mil`, out-of-vocabulary token → skipped, the standard
    * multinomial treatment) plus the prior; the predicted label is the
    * exact-integer argmax (ties → lexicographically smallest label).
    * Plan: one tokenize, a broadcast semi-join against the vocab, a
    * label-fanout broadcast join (|labels| copies of each kept token),
    * one partial-combined sum — linear in corpus tokens at any scale. */
  def naiveBayesScore(docs: DataFrame, model: NbModel,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val vocab = model.terms.select(col("term")).distinct()
    val toks = nbTerms(docs, textCol, model.charNgrams, col(idCol).as("id"))
      .join(broadcast(vocab), Seq("term"), "left_semi")
    val scored = toks
      .crossJoin(broadcast(model.labels))
      .join(broadcast(model.terms), Seq("term", "label"), "left")
      .select(col("id"), col("label"), col("prior_mil"),
        coalesce(col("ll_mil"), col("miss_mil")).as("tok_mil"))
      .groupBy(col("id"), col("label"), col("prior_mil"))
      .agg(sum(col("tok_mil")).as("sum_mil"))
      .select(col("id"), col("label"),
        (col("prior_mil") + col("sum_mil")).as("score_mil"))
    // exact-integer argmax; ties break to the smallest label via a
    // negative-rank component inside one max(struct) aggregate (no
    // corpus-wide window)
    val w = Window.orderBy(col("label"))
    val idx = model.labels.select(col("label"),
      row_number().over(w).cast("long").as("__li"))
    scored.join(broadcast(idx), "label")
      .groupBy(col("id"))
      .agg(max(struct(col("score_mil"), (-col("__li")).as("nli"),
        col("label"))).as("b"))
      .select(col("id").as(idCol), col("b.label").as("predicted"),
        col("b.score_mil").as("score_mil"))
  }
}
