package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass every training-data
  * pipeline runs before text leaves curation (emails, IP addresses, phone
  * numbers, SSN-shaped ids).
  *
  * Design constraints, in order:
  *
  *  - '''Narrow map only.''' Detection and redaction are per-row regexes
  *    over the text column: no shuffle, no state, no driver round-trip.
  *    At 100 TB this pass is scan-bound and embarrassingly parallel — the
  *    plan must stay a single `Project` over the parquet scan, inside
  *    whole-stage codegen (Spark's `RegExpReplace`/`RegExpCount` are
  *    codegen'd expressions; a UDF here would de-optimize the hottest
  *    full-corpus pass in the pipeline).
  *  - '''Portable pattern subset.''' Patterns stick to the common subset
  *    of Java regex and RE2 (character classes, bounded repetition, `\b`
  *    anchors — no lookaround, no backreferences), so an independent
  *    engine (the DuckDB oracle, or a sibling pipeline in Go/C++ whose
  *    regex engine is RE2) reproduces matches byte-for-byte. Scrubbing
  *    that cannot be cross-verified is a compliance risk, not a feature.
  *  - '''Fixed replacement tokens''' (`<EMAIL>` etc.), not deletion:
  *    downstream tokenizers see a stable vocabulary item and document
  *    lengths stay roughly honest.
  *
  * Redaction order is longest-pattern-first (email before ipv4 — an email
  * host can contain digit runs; phone before ssn — both are dash-digit
  * shapes and `\b` keeps them disjoint, but the order makes the intent
  * explicit and future-proofs pattern edits).
  */
object Pii {

  /** (name, pattern, replacement) — the scrub classes, in the order
    * redaction applies them. Patterns are RE2-safe (see scaladoc). */
  val classes: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"))

  /** Per-document match counts: one `n_<class>` long column per scrub
    * class. A pipeline gates on these (e.g. drop documents whose PII
    * density exceeds a threshold) before paying for redaction. */
  def stats(df: DataFrame, textCol: String = "text"): DataFrame =
    classes.foldLeft(df) { case (acc, (name, pat, _)) =>
      acc.withColumn(s"n_$name",
        regexp_count(col(textCol), lit(pat)).cast("long"))
    }

  /** The redacted text as a column (all classes applied in order). */
  def redactCol(text: Column): Column =
    classes.foldLeft(text) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Replace the text column with its redacted form. */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn(textCol, redactCol(col(textCol)))

  /** k-anonymity audit (Sweeney's model): the quasi-identifier
    * combinations whose equivalence class is smaller than `k` — every
    * row in such a class is re-identifiable by joining the quasi
    * columns against an external dataset, which is exactly the attack
    * k-anonymity bounds. Returns one row per violating combination with
    * its `class_size`; an empty result certifies the relation
    * k-anonymous over those columns. One map-side-combined aggregate
    * whose output is quasi-combination-cardinality-sized — the corpus
    * is scanned once, never shuffled row-wise. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** k-anonymize by suppression: drop every row whose quasi-identifier
    * equivalence class is smaller than `k` — the conservative release
    * policy when generalization hierarchies aren't available (the
    * standard alternative; generalize-then-suppress composes by mapping
    * the quasi columns first and calling this on the result). The kept
    * relation is k-anonymous over `quasiCols` by construction. Plan:
    * the violating-class relation ([[kAnonymityAudit]]) is
    * class-cardinality-sized and broadcasts into one anti-join — no
    * row-wise shuffle of the corpus. */
  def kAnonymizeSuppress(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    // null-SAFE anti join: a NULL quasi value forms an equivalence class
    // like any other (the audit already groups it), and plain equality
    // would never match it — the violating null class would sail through
    // the release, breaking the k-anonymous-by-construction guarantee
    val bad = kAnonymityAudit(df, quasiCols, k)
      .select(quasiCols.map(c => col(c).as(s"__bad_$c")): _*)
    df.join(broadcast(bad),
      quasiCols.map(c => col(c) <=> col(s"__bad_$c")).reduce(_ && _),
      "left_anti")
  }

  /** k-anonymize by GENERALIZATION: coarsen the quasi columns up a
    * declared value ladder until every equivalence class reaches `k`,
    * instead of dropping rows — the standard alternative to
    * [[kAnonymizeSuppress]] that preserves far more data at the same k
    * (a release pipeline reaches for it the first time suppression
    * deletes too much). `ladder` is the ordered sequence of
    * generalization states, coarsest LAST; each state lists one
    * expression per quasi column (positionally aligned with
    * `quasiCols` — e.g. `$1000-band → $4000-band → sign`, `segment →
    * '*'`). State 0 is implicitly the identity. The released relation
    * carries the generalized quasi values under their original names
    * plus `gen_level` (0 = no coarsening was needed), and is
    * k-anonymous over `quasiCols` by construction: the minimal level
    * whose audit is clean is chosen deterministically, and if even the
    * coarsest state leaves sub-k classes those are suppressed
    * (null-safely, like [[kAnonymizeSuppress]]) when
    * `suppressResidual`, refused loudly otherwise. Declare a coarsest
    * state that collapses to constants and residual suppression can
    * never trigger on a corpus of ≥ k rows.
    *
    * Plan shape at scale: ONE corpus pass computes the finest-level
    * classes with every coarser level's struct carried alongside (each
    * is a function of the finest values, so the group count stays the
    * level-0 class cardinality); each level's audit is then a tiny
    * re-aggregation of that class relation, never a re-scan — L ladder
    * states cost one shuffle plus L class-sized aggregates, and the
    * release is one narrow projection (plus one broadcast anti-join
    * only on the residual path). Every level must produce the same
    * data type per quasi column, so the release schema never depends
    * on where the search settles. */
  def kAnonymizeGeneralize(
      df: DataFrame,
      quasiCols: Seq[String],
      ladder: Seq[Seq[Column]],
      k: Long,
      suppressResidual: Boolean = true): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be >= 2, got $k")
    require(ladder.nonEmpty && ladder.forall(_.length == quasiCols.length),
      "each ladder state must generalize every quasi column (positionally)")
    val levels: Seq[Seq[Column]] = quasiCols.map(col) +: ladder
    val levelTypes = levels.map(es =>
      df.select(es.zip(quasiCols).map { case (e, c) => e.as(c) }: _*)
        .schema.map(_.dataType))
    require(levelTypes.distinct.size == 1,
      s"ladder states must keep each quasi column's data type stable " +
        s"(got ${levelTypes.distinct.mkString(" vs ")}) — the release " +
        "schema must not depend on where the level search settles")
    val lvlStructs = levels.zipWithIndex.map { case (es, i) =>
      struct(es.zip(quasiCols).map { case (e, c) => e.as(c) }: _*)
        .as(s"__q$i")
    }
    val classes = df.select(lvlStructs: _*)
      .groupBy(levels.indices.map(i => col(s"__q$i")): _*)
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true)
    def levelViolations(i: Int) =
      classes.groupBy(col(s"__q$i")).agg(sum(col("__n")).as("__s"))
        .filter(col("__s") < k)
    val chosen = levels.indices.find(i => levelViolations(i).isEmpty)
    val level = chosen.getOrElse(levels.length - 1)
    val gen = levels(level)
    val outCols = df.columns.toSeq.map { c =>
      val qi = quasiCols.indexOf(c)
      if (qi >= 0) gen(qi).as(c) else col(c)
    }
    val released = df.select(outCols: _*)
      .withColumn("gen_level", lit(level.toLong))
    chosen match {
      case Some(_) =>
        Dedup.releaseCheckpoint(classes)
        released
      case None if suppressResidual =>
        // even the coarsest state leaves sub-k classes — suppress them;
        // the class relation stays pinned with the result (class-
        // cardinality-sized, the broadcast-model lifetime class)
        val bad = levelViolations(level)
          .select(col(s"__q$level").as("__bad"))
        released.join(broadcast(bad),
          struct(quasiCols.map(col): _*) <=> col("__bad"), "left_anti")
      case None =>
        throw new IllegalStateException(
          s"kAnonymizeGeneralize: the coarsest ladder state still has " +
            s"equivalence classes below k=$k and suppressResidual=false " +
            "— declare a coarser terminal state or allow suppression")
    }
  }
}
