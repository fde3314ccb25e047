package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Dataset-curation operators for training-data pipelines: deterministic
  * train/val/test splitting, per-group sampling, and train→test
  * contamination detection.
  *
  * Everything here is '''hash-deterministic, never random''': a split or
  * sample decided by `rand()` changes when a task retries, when the
  * partition count changes, or when the job re-runs — which silently
  * leaks validation data into training across pipeline versions. A
  * decision derived from a stable document id is reproducible across
  * runs, engines, and cluster layouts, and every operator below is
  * verifiable row-for-row against an independent SQL engine because of
  * it.
  */
object Curation {

  /** Uniform-ish fraction in [0, 1) derived from a stable id: the first
    * 8 hex chars of md5(id || salt) as a 32-bit integer over 2^32.
    * md5, not xxhash64, deliberately: portable across engines (the DuckDB
    * oracle computes the identical value), and 32 of md5's 128 bits are
    * plenty for split assignment. Change `salt` to draw an independent
    * split from the same corpus. */
  def hashFraction(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Assign each row to a named split with the given weights (need not
    * sum to 1 — they are normalized). Purely a narrow map: no shuffle, no
    * state, trivially parallel at any scale, and stable under re-runs,
    * retries, and corpus appends (a new document never moves an existing
    * one between splits — the property `rand()`-based splitting loses). */
  def deterministicSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "graft-split"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 > 0), s"split weights must be positive: $splits")
    val total = splits.map(_._2).sum
    // cumulative thresholds; the last split takes the remainder so the
    // full [0,1) range is always covered. The fraction is materialized
    // once in its own projection — a CASE chain referencing the md5
    // expression per branch would re-hash per comparison.
    val thresholds = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val f = col("__split_f")
    val assign = splits.init.zip(thresholds.init)
      .foldLeft(None: Option[Column]) { case (acc, ((name, _), cum)) =>
        Some(acc match {
          case None => when(f < cum, name)
          case Some(c) => c.when(f < cum, name)
        })
      }
      .map(_.otherwise(splits.last._1))
      .getOrElse(lit(splits.last._1))
    df.withColumn("__split_f", hashFraction(col(idCol), salt))
      .withColumn("split", assign)
      .drop("__split_f")
  }

  /** Temporal train/test split with an EMBARGO gap — the leakage-safe
    * split when rows are time-ordered and the model must never train on
    * anything adjacent to evaluation data (autocorrelation leaks across
    * a naive boundary; the standard purged/embargoed split of financial
    * and time-series ML): rows at or before `trainEnd` are `train`, rows
    * strictly after `trainEnd + embargo` are `test`, and rows inside the
    * embargo window are labeled `embargo` — callers keep the label so
    * the dropped band is auditable (silently deleting it would read as
    * "covered everything" when a whole band was excluded).
    *
    * A narrow map (one CASE over the timestamp) — no shuffle, stable
    * under re-runs and appends like [[deterministicSplit]]. */
  def temporalSplit(
      df: DataFrame,
      tsCol: String,
      trainEnd: java.sql.Timestamp,
      embargo: java.time.Duration): DataFrame = {
    val embargoEnd = java.sql.Timestamp.from(
      trainEnd.toInstant.plus(embargo))
    df.withColumn("split",
      when(col(tsCol) <= lit(trainEnd), "train")
        .when(col(tsCol) > lit(embargoEnd), "test")
        .otherwise("embargo"))
  }

  /** Deterministic training-shard assignment + in-shard order: shard =
    * first 32 md5 bits of (id, salt) mod `nShards`, position = rank within
    * the shard by (hash, id). Together they define a reproducible global
    * shuffle of the corpus into `nShards` training files — the export
    * step after curation, where training-order determinism (restartable
    * jobs, bitwise-reproducible runs) matters and `rand()` or
    * `repartition`'s round-robin would not survive a re-run.
    *
    * Plan shape: the hash is a narrow map; the only shuffle is the window
    * partition on `shard` — exactly the exchange the downstream
    * `.repartition($"shard").sortWithinPartitions("position")` write wants,
    * so at 100 TB the exchange is reused and each shard lands as one
    * sorted file (shard width = corpus/nShards; pick nShards so a shard
    * fits an executor's sort spill budget). Change `salt` to draw an
    * independent epoch order from the same corpus. */
  def shard(
      df: DataFrame,
      nShards: Int,
      idCol: String,
      salt: String = "graft-shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", md5(concat(col(idCol).cast("string"), lit(salt))))
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("position", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Exactly `n` rows per group, chosen by hash order (md5 of id+salt):
    * a deterministic uniform sample that any engine reproduces. Ranking
    * is a per-group window sort — fine up to very large groups (the sort
    * spills); when groups are huge and `n` tiny, pre-filter with
    * [[hashFraction]] to ~`5n/|group|` first so the window sorts a sliver
    * instead of the corpus (two narrow passes, same result with
    * overwhelming probability, and the window then certifies exact-n). */
  def samplePerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      n: Int,
      idCol: String,
      salt: String = "graft-sample"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic sampling on a WEIGHT budget (tokens, bytes): every
    * row is kept at the uniform rate `min(1, budget / Σw)`, so the
    * EXPECTED sampled weight hits the budget and every unit of weight
    * — every token — is equally likely to survive, which is the
    * correct draw for a token-budgeted pretraining subsample (a
    * row-count budget would over-represent short documents per token).
    * The draw is the same md5 [[hashFraction]] as every splitter here:
    * stable under re-runs and appends, engine-replayable, never
    * `rand()`. One aggregate for the corpus weight (1-row broadcast) +
    * one narrow filter — no shuffle of the corpus. */
  def sampleWeighted(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      budgetWeight: Long,
      salt: String = "graft-wsample"): DataFrame = {
    require(budgetWeight > 0, "budgetWeight must be positive")
    val tot = df.agg(sum(col(weightCol).cast("double")).as("__tw"))
    df.crossJoin(broadcast(tot))
      .filter(hashFraction(col(idCol), salt) <
        least(lit(1.0), lit(budgetWeight.toDouble) / col("__tw")))
      .drop("__tw")
  }

  /** STRATIFIED sample with an exact total budget: allocate `total` rows
    * across the strata PROPORTIONALLY to stratum size using the
    * largest-remainder method (floor allocations, then the leftover
    * seats go to the largest fractional remainders; ties break on the
    * stratum key), and draw each stratum's quota by the same md5-hash
    * order as [[samplePerGroup]]. The eval-set builder's shape: "give me
    * exactly 10k docs that mirror the corpus's language mix".
    *
    * All allocation arithmetic is exact integers (`total·n_g div N`,
    * remainders as `total·n_g mod N`) — no doubles, so the quota table
    * is engine-reproducible, and the whole operator is hash-checkable.
    * Plan shape: one count aggregate (stratum-sized result), windows
    * only over that tiny quota table, then one slim per-stratum ranking
    * window over (id, stratum, md5) rows — same scale posture as
    * [[samplePerGroup]], with [[hashFraction]] pre-filtering available
    * the same way when strata are huge. */
  def sampleStratified(
      df: DataFrame,
      groupCols: Seq[String],
      total: Long,
      idCol: String,
      salt: String = "graft-sample"): DataFrame = {
    require(total >= 0, s"total must be non-negative: $total")
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    // floor quota + largest-remainder top-up, all integer arithmetic.
    // The grand total and `leftover = total − Σ floor` come from GLOBAL
    // windows over the quota table — one row per stratum, so the
    // single-partition window is free and avoids a self-join of shared
    // lineage (which Spark would flag as ambiguous)
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy()
      .orderBy(col("__rem").desc +: groupCols.map(col): _*)
    val quotas = counts
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .withColumn("__floor", expr(s"($total * __n) div __tot"))
      .withColumn("__rem", expr(s"($total * __n) % __tot"))
      .withColumn("__left", lit(total) - sum(col("__floor")).over(wAll))
      .withColumn("__rk", row_number().over(wRem))
      .withColumn("__quota",
        col("__floor") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      .select(groupCols.map(col) :+ col("__quota"): _*)
    val wPick = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))), col(idCol))
    df.join(broadcast(quotas), groupCols)
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Train→test contamination: for each test document, how many of its
    * distinct word shingles appear in ANY training document. A test doc
    * with high overlap was (near-)copied into the training set — the
    * standard n-gram decontamination check for evaluation integrity.
    *
    * Plan shape: both sides explode to distinct per-doc shingles; the
    * train side is reduced to a global distinct shingle set (one
    * hash-aggregate — at 100 TB this is the corpus vocabulary of
    * `shingleSize`-grams, far smaller than the corpus); the test side
    * joins against it and counts hits per doc. Only docs with ≥1 shared
    * shingle are returned.
    *
    * `hashShingles = true` (default) joins on 64-bit shingle hashes —
    * an 8-byte shuffle key instead of a string, the scale path.
    * `false` joins on the shingle strings themselves: bit-identical
    * semantics minus hash collisions, and expressible in portable SQL —
    * the oracle-checkable form (the equivalence of the two is a spec
    * test). */
  def contamination(
      train: DataFrame,
      test: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      hashShingles: Boolean = true): DataFrame = {
    val shingles: Column =
      if (hashShingles)
        graft.functions.MinHash.shingleHashesSorted(
          split(lower(trim(col(textCol))), "\\s+"), shingleSize)
      else array_distinct(T.wordShingles(col(textCol), shingleSize))
    val trainSh = train.select(explode(shingles).as("__sh")).distinct()
    test
      .select(col(idCol), explode(shingles).as("__sh"))
      .join(trainSh, "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** Leakage-safe splitting: near-duplicate documents must never straddle
    * train/val/test — a val doc with a train near-copy inflates eval.
    * Joins duplicate-group labels ([[Dedup.duplicateGroups]] output
    * `(id, group_id)`) and keys [[deterministicSplit]] by the GROUP
    * representative — singletons fall back to their own id — so a whole
    * cluster moves as one unit. Append-stability survives: a new member
    * of an existing group lands wherever its group already lives, and a
    * doc only moves if dedup later merges its group (the correct
    * behavior: the merge *discovered* the leak).
    *
    * 100 TB shape: `groups` holds only docs that appear in a duplicate
    * pair — a small fraction of the corpus — so AQE broadcasts the left
    * join in practice; everything else is the same shuffle-free narrow
    * map as [[deterministicSplit]]. */
  def groupedSplit(df: DataFrame, groups: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "graft-split"): DataFrame =
    deterministicSplit(
      df.join(groups.select(col("id").as(idCol), col("group_id")),
          Seq(idCol), "left")
        .withColumn("__rep", coalesce(col("group_id"), col(idCol))),
      "__rep", splits, salt)
      .drop("__rep", "group_id")

  /** Fuzzy decontamination: flag TRAIN documents that are NEAR-duplicates
    * of any TEST/benchmark document. Exact n-gram overlap
    * ([[contamination]]) catches verbatim leakage but misses paraphrased,
    * truncated, or lightly-edited copies — the common real-world shape
    * once benchmark text has passed through scraping and cleaning. This
    * form blocks train docs against test docs with banded MinHash LSH
    * (the same signature machinery as [[Dedup.minhashDuplicatePairs]],
    * pointed ACROSS two corpora instead of within one) and verifies each
    * candidate with exact Jaccard over distinct shingle sets.
    *
    * Returns one row per contaminated train doc:
    * `(idCol, n_test_matches, best_test_id, best_jaccard)` — the match
    * count, and the best-matching test doc ranked by ROUNDED Jaccard
    * (4 dp) with a test-id tiebreak so the ranking is engine-independent.
    *
    * `portable = true` swaps xxhash64 signatures for the md5-derived
    * closed-form banding ([[Dedup.portableBandKeys]]) so an external SQL
    * engine can replay the whole pipeline; bound it with `maxId` (the
    * portable mode is the oracle/audit path, xxhash64 is the scale path).
    *
    * 100 TB shape: the test/benchmark side is tiny (thousands of docs) but
    * this NEVER relies on that — both sides shuffle only `(band, id)`
    * pairs, a hot-band guard drops degenerate boilerplate buckets
    * (`maxBucket`, same policy as [[Dedup.candidatePairs]]), and shingle
    * sets attach to the candidate pairs by id AFTER blocking, so the wide
    * arrays never ride the band shuffle. */
  def contaminationFuzzy(
      train: DataFrame,
      test: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 10000,
      portable: Boolean = false,
      maxId: Long = Long.MaxValue): DataFrame = {
    require(numHashes % bands == 0, s"bands must divide numHashes")
    def side(df: DataFrame): DataFrame =
      if (portable)
        df.filter(col(idCol) <= maxId)
          // the maxId slice usually collapses to one input split; spread
          // the 64-pass md5 projection across cores (same note as
          // Dedup.portableBase)
          .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
          .select(col(idCol).as("id"), array_distinct(
            Dedup.portableShingleStrings(col(textCol), shingleSize)).as("shd"))
      else
        df.filter(col(idCol) <= maxId)
          .select(col(idCol).as("id"),
            graft.functions.MinHash.shingleHashesSorted(
              split(lower(trim(col(textCol))), "\\s+"), shingleSize).as("shd"))
    def bandKeys: Column =
      if (portable) Dedup.portableBandKeys(col("shd"), numHashes, bands)
      else Dedup.lshBandKeys(
        graft.functions.MinHash.signatureFromHashes(col("shd"), numHashes),
        bands, numHashes / bands)
    // portable mode intersects shingle STRINGS (the closed form DuckDB
    // replays); hashed mode runs the linear sorted-merge over hashed longs
    def jaccard(a: Column, b: Column): Column =
      if (portable)
        size(array_intersect(a, b)).cast("double") / size(array_union(a, b))
      else graft.functions.MinHash.jaccardSorted(a, b)
    Dedup.withProjectionCache(side(train)) { tr =>
      Dedup.withProjectionCache(side(test)) { te =>
        val tb = tr.select(explode(bandKeys).as("band"), col("id").as("train_id"))
        val eb = te.select(explode(bandKeys).as("band"), col("id").as("test_id"))
        // hot-band guard over BOTH sides' membership: one boilerplate band
        // key shared by m train and n test docs would emit m·n candidates
        val ok = tb.select(col("band")).union(eb.select(col("band")))
          .groupBy(col("band")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucket)
          .select(col("band"))
        val cand = tb.join(ok, "band").join(eb, "band")
          .select(col("train_id"), col("test_id")).distinct()
        val verified = cand
          .join(tr.select(col("id").as("train_id"), col("shd").as("shd_t")), "train_id")
          .join(te.select(col("id").as("test_id"), col("shd").as("shd_e")), "test_id")
          .withColumn("__j", round(jaccard(col("shd_t"), col("shd_e")), 4))
          .filter(col("__j") >= threshold)
        // single integer order key (rounded-Jaccard desc, test_id asc) so
        // best-match selection is one min_by aggregate, deterministic in
        // any engine: 4-dp Jaccard quantizes to ≤10000 and ids stay well
        // under the 1e7 stride
        val ordKey = (lit(10000L) - round(col("__j") * 10000).cast("long")) *
          lit(10000000L) + col("test_id")
        verified.groupBy(col("train_id").as(idCol))
          .agg(
            count(lit(1)).as("n_test_matches"),
            min_by(col("test_id"), ordKey).as("best_test_id"),
            max(col("__j")).as("best_jaccard"))
      }
    }
  }

  /** Temperature-weighted mixture sampling: draw ~`targetRows` documents
    * with per-group rates proportional to `count^alpha` — the standard
    * multilingual/multi-source rebalancing step (alpha=1 keeps the corpus
    * distribution, alpha=0 equalizes groups, alpha≈0.3–0.7 is the usual
    * compromise that upweights tail languages without starving the head).
    *
    * Plan shape at scale: one hash-aggregate whose OUTPUT is one row per
    * group (languages/sources — tiny by construction), the rate table
    * broadcast back, and a narrow hash filter. The corpus is scanned once
    * and never shuffled. The group-level sum-of-weights runs as an
    * unpartitioned window over the rate table only — single-partition by
    * design and correct at any corpus size because its input is
    * group-cardinality, not row-cardinality.
    *
    * Selection reuses [[hashFraction]] (md5-derived), so the draw is
    * deterministic across runs/engines and independently verifiable —
    * and appends don't reshuffle prior decisions: a document's fate
    * changes only if its group's rate does. */
  def mixtureSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      targetRows: Long,
      alpha: Double = 0.5,
      salt: String = "graft-mixture"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    require(targetRows > 0, "targetRows must be positive")
    val rates = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__c"))
      .withColumn("__w", pow(col("__c"), lit(alpha)))
      .withColumn("__tw", sum(col("__w")).over(Window.partitionBy()))
      // rate ordering mirrors the oracle SQL exactly (left-assoc chain) so
      // both engines round identically at every step
      .select(col(groupCol), least(lit(1.0),
        lit(targetRows.toDouble) * col("__w") / col("__tw") / col("__c"))
        .as("__rate"))
    df.join(broadcast(rates), groupCol)
      .filter(hashFraction(col(idCol), salt) < col("__rate"))
      .drop("__rate")
  }

  /** Split each document into fixed-size token windows with overlap — the
    * context-length chunking step of a pretraining/RAG pipeline. Stride =
    * `maxTokens - overlap`; a window starts at every stride position below
    * the token count, so trailing windows may be short and a short doc is
    * one chunk. Purely a narrow map + explode (no shuffle, no state):
    * embarrassingly parallel at any corpus size, and closed-form enough
    * for a SQL oracle to reproduce chunk-for-chunk. */
  def chunkDocuments(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxTokens: Int = 128,
      overlap: Int = 0): DataFrame = {
    val stride = maxTokens - overlap
    require(stride >= 1, s"overlap ($overlap) must be < maxTokens ($maxTokens)")
    df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0),
          greatest(size(col("__toks")) - 1, lit(0)), lit(stride))).as("__s"))
      .select(col(idCol),
        (col("__s") / stride).cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("__s") + 1, lit(maxTokens)))
          .as("chunk_text"),
        least(lit(maxTokens), size(col("__toks")) - col("__s")).as("n_tokens"))
  }

  /** DSIR-style importance-weighted data selection (Xie et al., "Data
    * Selection for Language Models via Importance Resampling", NeurIPS
    * 2023 — the public-literature standard for "pick raw-crawl documents
    * that look like a high-quality target domain"): estimate add-1
    * smoothed bag-of-n-grams models of the TARGET slice and the RAW
    * pool, weight every raw document by the log importance ratio
    * `Σ_features ln p̂_target(f) − ln p̂_raw(f)`, and keep the top `n`.
    *
    * Features are word unigrams plus adjacent bigrams of the lowercased
    * whitespace tokens — the paper's feature space, UNHASHED so an
    * external SQL engine can replay the exact strings (production at
    * 100 TB would hash features into a fixed bucket count to bound the
    * model; the vocabulary relation here is corpus-n-gram-sized, the
    * same side-relation class as the surprisal and NB models, which is
    * already far smaller than the corpus). Model weights are mil-scaled
    * `floor(ln(·)·10⁶)` longs — the [[graft.operators.Keywords.NbModel]]
    * discipline, so per-document scoring is EXACT integer summation and
    * the selection is engine-portable (same accepted training-time
    * ln-ulp boundary, documented there).
    *
    * Determinism: the paper resamples with Gumbel-top-k; this operator
    * takes the exact top `n` by `(weight desc, id)` — reproducible
    * across runs, engines, and cluster layouts, which is what makes the
    * selection auditable. The ranked take compiles to a distributed
    * TakeOrderedAndProject (per-partition top-n, then one n-sized
    * merge) — no corpus-wide window, no global sort.
    *
    * Plan shape at scale: one tokenize pass feeds one (feature,
    * target?) count aggregate (map-side combined); totals are a 1-row
    * broadcast; the weight table broadcasts back onto the raw side's
    * tokens; one partial-combined sum per doc; top-n. The corpus is
    * scanned once and shuffled only as (id, weight) partials.
    *
    * Returns `(idCol, weight_mil, n_feats, rk)` for the `n` selected
    * raw-pool documents (target-slice docs are the reference
    * distribution, never selected). */
  def dsirSelect(
      docs: DataFrame,
      targetPred: Column,
      n: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // the token relation feeds both the model estimation and the
    // per-doc scoring — scope-cache it so the corpus is tokenized once,
    // not once per consumer
    Dedup.withProjectionCache(
        dsirTokens(docs, targetPred, textCol, idCol))(dsirRanked(_, n))
      .withColumnRenamed("id", idCol)
  }

  /** The shared `(id, __t, term)` unigram+bigram feature relation of
    * [[dsirSelect]] / [[dsirSelectHashed]]. */
  private def dsirTokens(docs: DataFrame, targetPred: Column,
      textCol: String, idCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("id"), targetPred.as("__t"),
      split(lower(trim(col(textCol))), "\\s+").as("__w"))
    val grams = concat(col("__w"), expr(
      """transform(sequence(2, size(__w)),
        |  i -> concat(element_at(__w, i - 1), ' ', element_at(__w, i)))
        |""".stripMargin))
    base
      .select(col("id"), col("__t"),
        explode(when(size(col("__w")) >= 2, grams).otherwise(col("__w")))
          .as("term"))
      .filter(col("term") =!= "")
  }

  /** [[dsirSelect]] over a HASHED feature space — the paper's production
    * form (Xie et al. hash the n-gram features into a fixed 10k-bucket
    * space): every unigram/bigram maps to `hash(term) mod numBuckets`
    * and the importance models are estimated over bucket counts, so the
    * weight model is AT MOST `numBuckets` rows no matter the corpus. At
    * 100 TB this is the difference between a model that fits in one
    * broadcast forever (10k longs ≈ 160 KB) and the exact-vocabulary
    * model, whose bigram vocabulary grows with the pool until it is
    * itself corpus-scale and stops broadcasting. Collisions merge
    * feature counts — the paper's accepted trade; selection degrades
    * gracefully as buckets shrink (the spec pins exact-vs-hashed
    * selection overlap on a corpus where the models agree).
    *
    * `hashMode`: `"xxhash64"` (default) is the scale path — one
    * codegen'd 64-bit hash per token; `"md5"` derives the bucket from
    * md5's first 8 hex chars so an external SQL engine replays the
    * assignment in closed form (the [[hashFraction]] /
    * [[Dedup.portableBandKeys]] portability discipline). Everything
    * downstream of the bucket mapping — add-1 smoothing over observed
    * buckets, mil-scaled floor(ln) integer weights, exact integer doc
    * scores, deterministic `(weight desc, id)` top-n — is byte-for-byte
    * the [[dsirRanked]] stage the exact variant runs. */
  def dsirSelectHashed(
      docs: DataFrame,
      targetPred: Column,
      n: Int,
      numBuckets: Int = 10000,
      textCol: String = "text",
      idCol: String = "doc_id",
      hashMode: String = "xxhash64"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val bucket = hashMode match {
      case "xxhash64" => pmod(xxhash64(col("term")), lit(numBuckets.toLong))
      case "md5" =>
        pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"),
          lit(numBuckets.toLong))
      case other =>
        throw new IllegalArgumentException(
          s"hashMode must be xxhash64|md5, got $other")
    }
    val bucketed = dsirTokens(docs, targetPred, textCol, idCol)
      .select(col("id"), col("__t"), bucket.as("term"))
    Dedup.withProjectionCache(bucketed)(dsirRanked(_, n))
      .withColumnRenamed("id", idCol)
  }

  /** The model-estimate-and-rank stage of [[dsirSelect]] over the
    * exploded `(id, __t, term)` feature relation — split out so the
    * plan pin can see the shape the scope cache's trailing checkpoint
    * hides. The weight table's checkpoint stays alive with the result
    * (vocab-sized — the NB-model lifetime class). */
  private[graft] def dsirRanked(toks: DataFrame, n: Int): DataFrame = {
    val counts = toks.groupBy(col("term"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("cr"))
      .localCheckpoint(true)
    val totals = counts.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"),
      count(lit(1)).as("v"))
    // weights materialize (vocab-sized) BEFORE the count relation is
    // released — downstream plans must never read a released checkpoint
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("term"),
        (floor(log((col("ct") + lit(1)).cast("double") / (col("tt") + col("v")))
            * 1e6).cast("long") -
          floor(log((col("cr") + lit(1)).cast("double") / (col("tr") + col("v")))
            * 1e6).cast("long")).as("w_mil"))
      .localCheckpoint(true)
    Dedup.releaseCheckpoint(counts)
    val scored = toks.filter(!col("__t"))
      .join(broadcast(weights), "term")
      .groupBy(col("id"))
      .agg(sum(col("w_mil")).as("weight_mil"), count(lit(1)).as("n_feats"))
    val top = scored
      .orderBy(col("weight_mil").desc, col("id"))
      .limit(n)
    val w = Window.orderBy(col("weight_mil").desc, col("id"))
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("id"), col("weight_mil"), col("n_feats"), col("rk"))
  }

  /** Greedy sequence packing: assign whole documents (id order) to bins of
    * at most `budget` tokens — the example-packing step that turns a
    * ragged corpus into fixed-budget training sequences. A document larger
    * than the budget gets a bin to itself.
    *
    * Packing is inherently sequential, so it is sharded: documents pack
    * within deterministic shards of `shardSize` contiguous ids, and shards
    * pack independently — embarrassingly parallel, stable under re-runs
    * and appends (new ids land in new shards), and exactly what a 100 TB
    * pipeline wants (global packing order is meaningless; per-shard
    * sequences feed per-worker batches). The greedy fold itself runs as a
    * Catalyst `aggregate` higher-order function over each shard's sorted
    * doc list — sequential logic without a UDF and without leaving
    * codegen; per-shard state is one array of (id, bin) pairs, bounded by
    * `shardSize`. */
  def packSequences(
      df: DataFrame,
      idCol: String = "doc_id",
      tokenCol: Column,
      budget: Int = 2048,
      shardSize: Long = 1000L): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val docs = df.select(
      (col(idCol) / shardSize).cast("long").as("shard"),
      struct(col(idCol).cast("long").as("id"),
        tokenCol.cast("long").as("tok")).as("d"))
    // the zero carries the full accumulator type via the empty-array cast;
    // the merge must NOT cast per step (a per-element struct cast copies
    // the whole accumulated array — it doubled the fold's O(n²) constant)
    val zero = struct(
      array().cast("array<struct<id:bigint,bin:bigint>>").as("assigned"),
      lit(0L).as("bin"), lit(0L).as("used"))
    docs.groupBy(col("shard"))
      .agg(array_sort(collect_list(col("d"))).as("docs"))
      .select(col("shard"), aggregate(col("docs"), zero, (acc, d) => {
        val overflow = acc.getField("used") + d.getField("tok") > budget &&
          acc.getField("used") > 0
        val bin = when(overflow, acc.getField("bin") + 1)
          .otherwise(acc.getField("bin"))
        val used = when(overflow, d.getField("tok"))
          .otherwise(acc.getField("used") + d.getField("tok"))
        struct(
          concat(acc.getField("assigned"),
            array(struct(d.getField("id").as("id"), bin.as("bin")))).as("assigned"),
          bin.as("bin"), used.as("used"))
      }).getField("assigned").as("assigned"))
      .select(col("shard"), explode(col("assigned")).as("a"))
      .select(col("a.id").as(idCol), col("shard"), col("a.bin").as("bin"))
  }
}
