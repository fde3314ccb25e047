package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SimHash, TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Shared scale pattern: '''never compare all pairs.''' Every near-dup
  * variant first computes a per-document signature (narrow map, codegen'd),
  * then blocks documents into candidate buckets (one shuffle on a compact
  * key), and only scores pairs *within* a bucket. At 100 TB the all-pairs
  * join is O(n²) and impossible; bucketed candidate generation is
  * O(n · bucket_width) and AQE handles the skewed buckets.
  *
  * "Dedup" keeps the smallest id of each duplicate group (canonical-
  * representative policy): a doc is dropped when *any* smaller-id doc is
  * its duplicate. That avoids iterative connected components — at the
  * similarity thresholds used for near-dup (≥ 0.8) groups are cliques in
  * practice, and the policy is deterministic either way.
  */
object Dedup {

  // ---- exact ---------------------------------------------------------------

  /** Exact dedup on the normalized-text fingerprint: one hash-aggregate
    * (map-side partial → final), keeping the smallest-id row per group.
    * No window function — `min_by` aggregates partially on the map side,
    * a `row_number` window would sort whole partitions. */
  def exact(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val cols = df.columns.toSeq
    df.withColumn("__fp", T.fingerprint(col(textCol)))
      .groupBy(col("__fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
  }

  // ---- MinHash + LSH -------------------------------------------------------

  /** MinHash signature: k permutations approximated by k seeded xxhash64
    * functions; sig[i] = min over shingles of hash_i(shingle). */
  def minhashSignature(shingles: Column, numHashes: Int = 64): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingles, s => xxhash64(lit(i), s)))
    }: _*)

  /** Banded LSH keys: split the signature into `bands` bands of `rows`
    * hashes; two docs collide on a band iff that slice matches exactly.
    * P(collide | jaccard=s) = 1-(1-s^rows)^bands. */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(sig, b * rows + 1, rows)).as("sig"))
    }: _*)

  /** Candidate duplicate pairs (id_a < id_b) from MinHash banding, verified
    * with exact shingle Jaccard ≥ `threshold`.
    *
    * Plan shape: signature (narrow) → explode bands (×bands) → self-join on
    * the band key (shuffle on compact (band,sig64)) → distinct pairs →
    * exact verify. The per-bucket self-join is quadratic only within a
    * bucket; band width (`rows`) controls bucket selectivity. */
  def minhashDuplicatePairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val rows = numHashes / bands
    val withSig = df
      .select(col(idCol).as("id"), T.wordShingles(col(textCol), shingleSize).as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
      .withColumn("band", explode(lshBandKeys(col("sig"), bands, rows)))
      .select(col("id"), col("shingles"), col("band"))

    val a = withSig.select(col("band"), col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = withSig.select(col("band"), col("id").as("id_b"), col("shingles").as("sh_b"))

    a.join(b, a("band") === b("band") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", T.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash-LSH dedup: drop every doc with a verified smaller-id dup. */
  def minhash(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      threshold: Double = 0.8): DataFrame = {
    val dupIds = minhashDuplicatePairs(df, textCol, idCol, threshold = threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  // ---- SimHash -------------------------------------------------------------

  /** SimHash near-dup pairs: 64-bit simhash per doc (custom codegen'd
    * expression), blocked on 16-bit chunks — Hamming distance ≤ 3 across 4
    * chunks guarantees at least one identical chunk (pigeonhole), so
    * blocking is lossless for maxHamming ≤ 3. Verified with
    * `bit_count(a^b)`. */
  def simhashDuplicatePairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {
    val chunks = 4 // 4 × 16-bit chunks of the 64-bit hash
    val withHash = df.select(col(idCol).as("id"),
      SimHash.simhash64(split(lower(trim(col(textCol))), "\\s+")).as("sh"))
      .withColumn("chunk", explode(array((0 until chunks).map { c =>
        struct(lit(c).as("pos"),
          shiftrightunsigned(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL)).as("val"))
      }: _*)))

    val a = withHash.select(col("chunk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withHash.select(col("chunk"), col("id").as("id_b"), col("sh").as("sh_b"))

    a.join(b, a("chunk") === b("chunk") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  def simhash(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {
    val dupIds = simhashDuplicatePairs(df, textCol, idCol, maxHamming)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  // ---- n-gram Jaccard (exact, small scopes) --------------------------------

  /** Exact all-pairs n-gram Jaccard within an id range — the oracle-
    * checkable baseline for the LSH variants. All-pairs is O(n²): keep
    * `maxId` small (driver tests) or pre-block (production path is
    * [[minhashDuplicatePairs]]). */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxId: Long = Long.MaxValue): DataFrame = {
    val sh = df.filter(col(idCol) <= maxId)
      .select(col(idCol).as("id"), T.wordShingles(col(textCol), shingleSize).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard", T.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- embedding cosine near-dup -------------------------------------------

  /** Embedding near-dup pairs: hyperplane-LSH blocking + exact cosine ≥
    * `threshold` within buckets. `numPlanes` trades recall for bucket
    * size (more planes → smaller buckets → faster, lower recall). */
  def embeddingDuplicatePairs(
      df: DataFrame,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      dim: Int = 64,
      threshold: Double = 0.95,
      numPlanes: Int = 8,
      seed: Long = 42L): DataFrame = {
    val planes = V.randomPlanes(numPlanes, dim, seed)
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", V.hyperplaneBucket(col("vec"), planes))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("vec").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("vec").as("v_b"))
    a.join(b, a("bucket") === b("bucket") && col("id_a") < col("id_b"))
      .withColumn("cos", V.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  def embedding(df: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", dim: Int = 64,
      threshold: Double = 0.95): DataFrame = {
    val dupIds = embeddingDuplicatePairs(df, vecCol, idCol, dim, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }
}
