package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage (entity resolution) — find record pairs whose
  * key strings are within a small edit distance, without an all-pairs
  * comparison (O(n²) `levenshtein` calls is a non-starter on a 100 TB
  * entity table).
  *
  * Scalable shape — deletion-neighborhood blocking (the FastSS /
  * SymSpell construction): every string expands to itself plus its
  * |s| one-character-deletion variants, and candidates are pairs that
  * share a variant. For edit distance ≤ 1 this blocking is COMPLETE:
  *  - substitution at position i → deleting position i from both sides
  *    yields the same variant;
  *  - insertion/deletion of one char → the longer string's deletion
  *    variant equals the shorter string itself (its 0-deletion entry).
  * So every qualifying pair meets in some block, and a final
  * `levenshtein ≤ maxDist` verify discards the false candidates the
  * blocks admit. The same three-stage signature → block → verify shape
  * as the MinHash/SimHash dedup families: candidate generation is a
  * narrow map + explode (|s|+1 rows per record), the shuffle carries
  * only `(block_hash, id)` — 16-byte rows, never the full record — and
  * per-block fan-out is bounded by block size, not corpus size.
  *
  * The block key is `xxhash64(variant)` (slim fixed-width shuffle rows
  * instead of strings). Hash collisions are harmless to correctness:
  * a collision can only ADD a candidate pair, and any pair that truly
  * is within distance 1 already shares a genuine variant block — so
  * after the levenshtein verify the output is exactly
  * {(a,b) : lev(a,b) ≤ maxDist, a.id < b.id} regardless of the hash,
  * which is what makes the production path directly oracle-able.
  */
object Linkage {

  /** All one-character-deletion variants of `col`, plus the string
    * itself: element i of the result drops character i+1 (1-indexed);
    * element |s| is the unmodified string. */
  private def deletionNeighborhood(c: String) =
    expr(s"transform(sequence(0, length($c)), i -> " +
      s"concat(substring($c, 1, i), substring($c, i + 2, length($c))))")

  /** All DISTINCT variants of `col` with up to `k` character deletions
    * (the string itself included) — the depth-`k` FastSS neighborhood.
    * Built by `k` rounds of the single-deletion expansion with a
    * distinct between rounds; size grows as O(|s|^k / k!), which is why
    * depth 2 is the practical ceiling (a 20-char key yields ~200
    * variants at k=2 vs 21 at k=1 — the standard SymSpell trade). */
  private def deletionNeighborhoodK(c: String, k: Int) = {
    val expand = (inner: String) =>
      s"array_distinct(flatten(transform($inner, v -> " +
        "transform(sequence(0, length(v)), i -> " +
        "concat(substring(v, 1, i), substring(v, i + 2, length(v)))))))"
    expr(Iterator.iterate(s"array($c)")(expand).drop(k).next())
  }

  /** Pairs of records in `df` whose `nameCol` values are within edit
    * distance `maxDist` (1 or 2 — see below). Output:
    * `(id_a, id_b, dist)` with `id_a < id_b`, one row per pair even
    * when the pair shares several blocks.
    *
    * `maxBlock` guards pathological blocks (e.g. thousands of records
    * collapsing onto one short variant): blocks larger than the cap are
    * dropped entirely — the adversarial-skew guard every blocking
    * family here carries ([[Dedup.minhash]] precedent).
    *
    * `maxDist` may be 1 or 2: the depth-`k` deletion neighborhood is
    * complete for edit distance ≤ k (FastSS/Bocek et al. 2007 — any
    * edit script of length ≤ k maps to deletion sequences of ≤ k on
    * each side that meet in a common variant), and the per-record
    * variant count grows O(|s|^k/k!), so depth 2 is the practical
    * ceiling. */
  def fuzzyPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      maxDist: Int = 1,
      maxBlock: Int = 1000): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      "deletion-neighborhood blocking supports maxDist 1 or 2")
    // slim (block, id) relation; the name re-attaches only at verify
    // distinct: a string can produce the same deletion variant twice
    // ("aa" → "a" either way) — without it the duplicate (block, id)
    // entries pair a record with ITSELF inside its own block
    val blocks = df
      .select(col(idCol).as("__id"), col(nameCol).as("__name"))
      .withColumn("__block",
        explode(deletionNeighborhoodK("__name", maxDist)))
      .select(xxhash64(col("__block")).as("__block"), col("__id"))
      .distinct()
    val guarded = blocks
      .groupBy("__block").agg(collect_list("__id").as("__ids"))
      .filter(size(col("__ids")) between (2, maxBlock))
    // within-block pairs, deduped across blocks BEFORE names attach
    val cands = guarded
      .select(explode(expr(
        """flatten(transform(__ids, (a, i) ->
          |  transform(slice(__ids, i + 2, size(__ids)), b ->
          |    struct(least(a, b) AS id_a, greatest(a, b) AS id_b))))"""
          .stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    val names = df.select(col(idCol).as("__id"), col(nameCol).as("__name"))
    cands
      .join(names.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__name", "__name_a"), Seq("id_a"))
      .join(names.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__name", "__name_b"), Seq("id_b"))
      .withColumn("dist", levenshtein(col("__name_a"), col("__name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Link two tables: for each `left` record, the `right` records whose
    * key is within edit distance 1 — same blocking, but the block join
    * is left-blocks × right-blocks instead of within-block pairs, so
    * the operator degrades to the classic blocked record-linkage join.
    * Output: `(left id, right id, dist)`. */
  def fuzzyJoin(
      left: DataFrame, leftId: String, leftName: String,
      right: DataFrame, rightId: String, rightName: String,
      maxDist: Int = 1,
      maxBlock: Int = 1000): DataFrame = {
    require(maxDist == 1, "deletion-neighborhood blocking is complete only for maxDist = 1")
    def side(df: DataFrame, id: String, name: String, tag: String) = {
      val b = df
        .select(col(id).as(s"id_$tag"), col(name).as(s"__name_$tag"))
        .withColumn("__block", explode(deletionNeighborhood(s"__name_$tag")))
        .select(xxhash64(col("__block")).as("__block"), col(s"id_$tag"))
        .distinct()
      // per-side hot-block guard: cap by deterministic id order
      import org.apache.spark.sql.expressions.Window
      b.withColumn("__rn", row_number().over(
          Window.partitionBy("__block").orderBy(col(s"id_$tag"))))
        .filter(col("__rn") <= maxBlock)
        .drop("__rn")
    }
    val cands = side(left, leftId, leftName, "l")
      .join(side(right, rightId, rightName, "r"), "__block")
      .select("id_l", "id_r").distinct()
    cands
      .join(left.select(col(leftId).as("id_l"),
        col(leftName).as("__nl")), Seq("id_l"))
      .join(right.select(col(rightId).as("id_r"),
        col(rightName).as("__nr")), Seq("id_r"))
      .withColumn("dist", levenshtein(col("__nl"), col("__nr")))
      .filter(col("dist") <= maxDist)
      .select(col("id_l"), col("id_r"), col("dist"))
  }
}
