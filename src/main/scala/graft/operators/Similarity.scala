package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k: one narrow map (codegen'd
  *     higher-order functions, no shuffle) + a global `ORDER BY LIMIT k`
  *     which Spark executes as per-partition top-k then a k-row merge on
  *     the driver (`TakeOrderedAndProject`). Linear in corpus size: the
  *     correctness baseline, and perfectly serviceable when the corpus
  *     fits one scan.
  *   - [[lshTopK]] — hyperplane-LSH bucketed search: probe only buckets
  *     within `probeHamming` bits of the query's bucket. At 100 TB this
  *     turns a full scan into a partition-pruned read when the table is
  *     written partitioned by bucket (see [[bucketize]]); recall is tuned
  *     by `numPlanes` / `probeHamming`.
  */
object Similarity {

  /** Exact cosine top-k for one query vector. */
  def bruteForceTopK(
      df: DataFrame,
      query: Seq[Float],
      k: Int = 10,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame =
    df.select(col(idCol),
        round(V.cosine(col(vecCol), V.vectorLit(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Materialize LSH buckets (write this partitioned-by-bucket for
    * partition-pruned probes at scale). */
  def bucketize(df: DataFrame, vecCol: String = "embedding",
      numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = V.randomPlanes(numPlanes, dim, seed)
    df.withColumn("bucket", V.hyperplaneBucket(col(vecCol), planes))
  }

  /** ANN top-k: score only vectors whose bucket is within `probeHamming`
    * bits of the query's bucket (multi-probe LSH — probing neighbors
    * recovers most of the recall lost to unlucky hyperplane splits). */
  def lshTopK(
      df: DataFrame,
      query: Seq[Float],
      k: Int = 10,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      numPlanes: Int = 8,
      dim: Int = 64,
      probeHamming: Int = 1,
      seed: Long = 42L): DataFrame = {
    val planes = V.randomPlanes(numPlanes, dim, seed)
    // query bucket computed driver-side (tiny), then pushed as a literal
    // predicate → with bucket-partitioned storage this is partition pruning
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a.toDouble * b }.sum
      if (d > 0) 1L << i else 0L
    }.sum

    df.withColumn("bucket", V.hyperplaneBucket(col(vecCol), planes))
      .filter(bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
      .select(col(idCol),
        round(V.cosine(col(vecCol), V.vectorLit(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs top-k join (each left row → its k nearest right rows) via
    * LSH blocking + windowed rank. Use for bulk kNN-graph construction;
    * the brute-force equivalent is an O(n²) cross join and intentionally
    * not provided. */
  def knnJoin(
      left: DataFrame,
      right: DataFrame,
      k: Int = 10,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      numPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = V.randomPlanes(numPlanes, dim, seed)
    val l = left.select(col(idCol).as("id_l"), col(vecCol).as("v_l"))
      .withColumn("bucket", V.hyperplaneBucket(col("v_l"), planes))
    val r = right.select(col(idCol).as("id_r"), col(vecCol).as("v_r"))
      .withColumn("bucket", V.hyperplaneBucket(col("v_r"), planes))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_l")).orderBy(col("cos").desc, col("id_r"))
    l.join(r, "bucket")
      .filter(col("id_l") =!= col("id_r"))
      .withColumn("cos", round(V.cosine(col("v_l"), col("v_r")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_l"), col("id_r"), col("cos"), col("rank"))
  }
}
