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

  /** IVF (inverted-file) index: k-means cells over the corpus; queries probe
    * only the `nProbes` nearest cells. The training pass is one k-means fit
    * (sampled corpus at 100 TB); the assignment pass is a narrow map. Stored
    * partitioned by `cell`, a probe reads `nProbes/numCells` of the data —
    * partition pruning does the work, same storage story as [[bucketize]]
    * but data-adaptive (tighter cells than random hyperplanes on clustered
    * corpora). */
  def ivfFit(df: DataFrame, vecCol: String = "embedding",
      numCells: Int = 16, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = df.withColumn("__features", array_to_vector(col(vecCol)))
    val model = new KMeans().setK(numCells).setSeed(seed)
      .setFeaturesCol("__features").fit(featured)
    IvfIndex(model)
  }

  case class IvfIndex(model: org.apache.spark.ml.clustering.KMeansModel) {
    import org.apache.spark.ml.functions.array_to_vector

    def centers: Array[Array[Double]] = model.clusterCenters.map(_.toArray)

    /** Assign each row to its cell (write `partitionBy("cell")` at scale). */
    def assign(df: DataFrame, vecCol: String = "embedding"): DataFrame =
      model.setPredictionCol("cell")
        .transform(df.withColumn("__features", array_to_vector(col(vecCol))))
        .drop("__features")

    /** ANN top-k probing the `nProbes` nearest cells to the query. */
    def topK(df: DataFrame, query: Seq[Float], k: Int = 10,
        vecCol: String = "embedding", idCol: String = "vec_id",
        nProbes: Int = 2): DataFrame = {
      val qc = query.map(_.toDouble).toArray
      val probeCells = centers.zipWithIndex
        .map { case (c, i) =>
          val d = c.zip(qc).map { case (a, b) => (a - b) * (a - b) }.sum
          (i, d)
        }
        .sortBy(_._2).take(nProbes).map(_._1).toSeq
      assign(df, vecCol)
        .filter(col("cell").isInCollection(probeCells))
        .select(col(idCol),
          round(V.cosine(col(vecCol), V.vectorLit(query)), 4).as("cos"))
        .orderBy(col("cos").desc, col(idCol))
        .limit(k)
    }
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
