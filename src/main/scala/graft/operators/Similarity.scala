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
        round(V.cosineFused(col(vecCol), V.vectorLit(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Materialize LSH buckets (write this partitioned-by-bucket for
    * partition-pruned probes at scale). */
  def bucketize(df: DataFrame, vecCol: String = "embedding",
      numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = V.randomPlanes(numPlanes, dim, seed)
    df.withColumn("bucket", V.hyperplaneBucket(col(vecCol), planes))
  }

  /** Per-table hyperplane sets: independent seeds per table (the OR-of-ANDs
    * amplification of classic LSH — a neighbor is a candidate if it
    * collides in ANY table, so recall compounds as 1-(1-p)^L while the
    * per-table selectivity stays sharp). */
  private def planeTables(numTables: Int, numPlanes: Int, dim: Int,
      seed: Long): Seq[Seq[Seq[Float]]] =
    (0 until numTables).map(t => V.randomPlanes(numPlanes, dim, seed + t * 1000003L))

  /** ANN top-k: score only vectors whose bucket is within `probeHamming`
    * bits of the query's bucket in at least one of `numTables` hash tables
    * (multi-probe + multi-table LSH: probing Hamming neighbors recovers
    * recall lost to unlucky splits near a plane; extra tables recover
    * recall for moderate-similarity neighbors, compounding as 1-(1-p)^L).
    *
    * At 100 TB a multi-table index is L bucket-partitioned copies of the
    * id+vector projection (the standard LSH index layout — see
    * [[bucketize]], one write per table seed); each table's probe is then a
    * partition-pruned read of its own copy and the candidate union feeds
    * one top-k. On a single scan (here) the same semantics is the OR
    * filter below.
    *
    * `portable = true` swaps the Gaussian planes for the integer-exact
    * md5-derived plane tables (namespaces `t0:`, `t1:`, … — see
    * [[graft.functions.VectorFunctions.portablePlanes]]): same filter →
    * score → top-k code path, but every bucket bit is reproducible in
    * closed-form SQL, which is what makes the scan hash-checkable against
    * an external engine. The Gaussian default stays the perf path. */
  def lshTopK(
      df: DataFrame,
      query: Seq[Float],
      k: Int = 10,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      numPlanes: Int = 8,
      dim: Int = 64,
      probeHamming: Int = 1,
      seed: Long = 42L,
      numTables: Int = 4,
      portable: Boolean = false): DataFrame = {
    // per-table Hamming predicate; query bucket computed driver-side
    // (tiny), pushed as literal predicates → with per-table
    // bucket-partitioned storage each disjunct is a partition-pruning
    // probe of that table's copy
    val cond =
      if (portable) {
        (0 until numTables).map { t =>
          val planes = V.portablePlanes(numPlanes, dim, ns = s"t$t:")
          val qBits = V.portableBucketBitsLocal(query, planes)
          // single-reference Hamming: the bits expression appears ONCE per
          // table — a per-position substring form would embed the
          // interpreted 8-plane×64-dim bucket fold numPlanes× per table
          // per row (CollapseProject duplicates HOF forms referenced more
          // than once)
          val bits = V.portableBucketBits(col(vecCol), planes)
          aggregate(
            zip_with(split(bits, ""), split(lit(qBits), ""),
              (a, b) => when(a === b, lit(0)).otherwise(lit(1))),
            lit(0), (acc, x) => acc + x) <= probeHamming
        }.reduce(_ || _)
      } else {
        planeTables(numTables, numPlanes, dim, seed).map { planes =>
          val qBucket = planes.zipWithIndex.map { case (p, i) =>
            val d = p.zip(query).map { case (a, b) => a.toDouble * b }.sum
            if (d > 0) 1L << i else 0L
          }.sum
          bit_count(V.hyperplaneBucket(col(vecCol), planes)
            .bitwiseXOR(lit(qBucket))) <= probeHamming
        }.reduce(_ || _)
      }

    df.filter(cond)
      .select(col(idCol),
        round(V.cosineFused(col(vecCol), V.vectorLit(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Materialize the multi-table LSH index: one bucket-PARTITIONED copy of
    * the `(id, vec)` projection per hash table (the standard LSH index
    * layout — L copies, each ~the corpus projection's size). A probe of
    * table `t` then reads only the partitions within `probeHamming` bits
    * of the query's bucket in that table: partition pruning does the work
    * the OR-filter scan of [[lshTopK]] does by brute force. */
  def writeLshIndex(df: DataFrame, path: String,
      vecCol: String = "embedding", idCol: String = "vec_id",
      numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L,
      numTables: Int = 4): Unit = {
    val tables = planeTables(numTables, numPlanes, dim, seed)
    tables.zipWithIndex.foreach { case (planes, t) =>
      // repartition on the partition column first: without it every write
      // task opens a file in every bucket dir (tasks × 2^planes tiny
      // files); with it each bucket is one task → one file per dir. Size
      // numPlanes so a bucket holds many rows — 2^planes should be far
      // below the corpus row count.
      df.select(col(idCol), col(vecCol))
        .withColumn("bucket", V.hyperplaneBucket(col(vecCol), planes))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/table=$t")
    }
  }

  /** ANN top-k against a [[writeLshIndex]] index: per-table
    * PARTITION-PRUNED reads (the Hamming predicate is a function of the
    * partition column, so it prunes at planning time), candidate union,
    * id-dedup, one top-k. Must be called with the same
    * planes/seed/numTables the index was written with. Identical result
    * set to [[lshTopK]] at the same parameters — the index trades L copies
    * of storage for reading only ~L·C(planes,≤h)/2^planes of the corpus
    * per query. */
  def lshTopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      query: Seq[Float],
      k: Int = 10,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      numPlanes: Int = 8,
      dim: Int = 64,
      probeHamming: Int = 1,
      seed: Long = 42L,
      numTables: Int = 4): DataFrame = {
    val tables = planeTables(numTables, numPlanes, dim, seed)
    // ONE read of the whole index root: `table` and `bucket` are both
    // partition columns, so the per-table Hamming disjunction is entirely
    // a partition predicate — identical pruning to four separate reads,
    // but one file-listing, one plan, one scan job instead of a 4-way
    // union of single-table reads
    val cond = tables.zipWithIndex.map { case (planes, t) =>
      val qBucket = planes.zipWithIndex.map { case (p, i) =>
        val d = p.zip(query).map { case (a, b) => a.toDouble * b }.sum
        if (d > 0) 1L << i else 0L
      }.sum
      col("table") === t &&
        bit_count(col("bucket").cast("long")
          .bitwiseXOR(lit(qBucket))) <= probeHamming
    }.reduce(_ || _)
    spark.read.parquet(path)
      .filter(cond)
      .select(col(idCol), col(vecCol))
      .dropDuplicates(idCol)
      .select(col(idCol),
        round(V.cosineFused(col(vecCol), V.vectorLit(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** [[writeLshIndex]] variant that stores int8-QUANTIZED vectors
    * (`array<tinyint>` + the integer self-dot) instead of floats — the
    * index bytes per element drop 4×, so at 100 TB of embeddings each
    * probe reads a quarter of the pages for the same bucket pruning.
    * Bucketing still happens on the float vector (identical partition
    * layout and pruning to the full-precision index); scoring inside the
    * probe is exact integer dot products. Quantized cosine sits within
    * ~1/127 of exact (spec-pinned recall vs the float index), and callers
    * needing exact order re-rank the returned top-k against the source
    * table — k rows, not a corpus read. */
  def writeLshIndexQuantized(df: DataFrame, path: String,
      vecCol: String = "embedding", idCol: String = "vec_id",
      numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L,
      numTables: Int = 4): Unit = {
    val tables = planeTables(numTables, numPlanes, dim, seed)
    val quantized = df.select(col(idCol), col(vecCol))
      .withColumn("__qs", V.quantScale(col(vecCol)))
      .withColumn("q", transform(
        V.quantize(col(vecCol), col("__qs")), x => x.cast("byte")))
      .withColumn("nq", V.dotInt(col("q"), col("q")))
    tables.zipWithIndex.foreach { case (planes, t) =>
      quantized
        .withColumn("bucket", V.hyperplaneBucket(col(vecCol), planes))
        .select(col(idCol), col("q"), col("nq"), col("bucket"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/table=$t")
    }
  }

  /** ANN top-k against a [[writeLshIndexQuantized]] index: identical
    * partition-pruned probe shape to [[lshTopKIndexed]], but candidates
    * are scored with integer dots against the driver-quantized query
    * (same symmetric scheme, HALF_UP ties like the executor kernel).
    * Returns `(idCol, cos_q)` with the QUANTIZED cosine, rounded 4 dp. */
  def lshTopKIndexedQuantized(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      query: Seq[Float],
      k: Int = 10,
      idCol: String = "vec_id",
      numPlanes: Int = 8,
      dim: Int = 64,
      probeHamming: Int = 1,
      seed: Long = 42L,
      numTables: Int = 4): DataFrame = {
    val tables = planeTables(numTables, numPlanes, dim, seed)
    val maxAbs = query.map(x => math.abs(x.toDouble)).max
    val qs = if (maxAbs == 0.0) 0.0 else 127.0 / maxAbs
    val qInt = query.map(x => BigDecimal(x.toDouble * qs)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt)
    val qNorm = qInt.map(x => x.toLong * x).sum.toDouble
    val cond = tables.zipWithIndex.map { case (planes, t) =>
      val qBucket = planes.zipWithIndex.map { case (p, i) =>
        val d = p.zip(query).map { case (a, b) => a.toDouble * b }.sum
        if (d > 0) 1L << i else 0L
      }.sum
      col("table") === t &&
        bit_count(col("bucket").cast("long")
          .bitwiseXOR(lit(qBucket))) <= probeHamming
    }.reduce(_ || _)
    val qLit = array(qInt.map(x => lit(x)): _*)
    val dot = V.dotInt(col("q"), qLit).cast("double")
    spark.read.parquet(path)
      .filter(cond)
      .select(col(idCol), col("q"), col("nq"))
      .dropDuplicates(idCol)
      .select(col(idCol),
        round(when(col("nq") === 0L || lit(qNorm) === 0.0, lit(0.0))
          .otherwise(dot / sqrt(col("nq").cast("double") * lit(qNorm))),
          4).as("cos_q"))
      .orderBy(col("cos_q").desc, col(idCol))
      .limit(k)
  }

  /** PORTABLE stored LSH index: one copy of the `(id, vec)` projection
    * partitioned by the integer-exact md5-plane bucket bitstring (see
    * [[graft.functions.VectorFunctions.portableBucketBits]]) — the same
    * partition-pruned probe layout as [[writeLshIndex]], but every bucket
    * value is reproducible in closed-form SQL, so the probe path (not just
    * the scan path) is hash-checkable against an external engine. Bucket
    * values are prefixed 'b' because a bare '0'/'1' bitstring in a
    * partition directory would be type-inferred back as a number on read
    * (leading zeros lost). */
  def writeLshIndexPortable(df: DataFrame, path: String,
      vecCol: String = "embedding", idCol: String = "vec_id",
      numPlanes: Int = 8, dim: Int = 64): Unit = {
    val planes = V.portablePlanes(numPlanes, dim)
    df.select(col(idCol), col(vecCol))
      .withColumn("bucket",
        concat(lit("b"), V.portableBucketBits(col(vecCol), planes)))
      .repartition(col("bucket")) // one file per bucket dir, not tasks×buckets
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(path)
  }

  /** ANN top-k against a [[writeLshIndexPortable]] index: the Hamming
    * predicate is 8 char comparisons on the partition column — entirely a
    * partition predicate, pruned at planning time. The query's bucket is
    * computed driver-side with the same integer algebra
    * ([[graft.functions.VectorFunctions.portableBucketBitsLocal]]), so the
    * probe key matches the stored buckets exactly. */
  def lshTopKIndexedPortable(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      query: Seq[Float],
      k: Int = 10,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      numPlanes: Int = 8,
      dim: Int = 64,
      probeHamming: Int = 2): DataFrame = {
    val planes = V.portablePlanes(numPlanes, dim)
    val qBits = V.portableBucketBitsLocal(query, planes)
    // Hamming over the 'b'-prefixed bitstring: position p of the bits is
    // char p+2 of the partition value
    val ham = (0 until numPlanes).map { p =>
      when(substring(col("bucket"), p + 2, 1) === lit(qBits.substring(p, p + 1)),
        lit(0)).otherwise(lit(1))
    }.reduce(_ + _)
    spark.read.parquet(path)
      .filter(ham <= probeHamming)
      .select(col(idCol),
        round(V.cosineFused(col(vecCol), V.vectorLit(query)), 4).as("cos"))
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
  /** Collect a bounded fit sample to the driver: `fraction` down-sample,
    * hard-capped at `maxRows`. The cap is the 100 TB design point — a
    * k-means fit set does not need to GROW with the corpus (a few hundred
    * points per target center suffice), so the fit is a driver-side
    * computation over a bounded array, like loading a codebook. Only the
    * assignment/encode pass must see every row, and that stays the native
    * codegen'd kernel. */
  private def fitSample(df: DataFrame, vecCol: String,
      fraction: Double, seed: Long, maxRows: Int): Array[Array[Double]] = {
    val sampled = if (fraction < 1.0)
      df.sample(withReplacement = false, fraction, seed) else df
    sampled.select(col(vecCol)).limit(maxRows).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
  }

  /** Plain seeded Lloyd over a driver-side point array: random init from
    * distinct sample points, squared-euclidean assignment with
    * lowest-index tie-break (the [[graft.functions.NearestCenter]]
    * contract), an empty cluster re-seeds to the point farthest from its
    * center. Replaces the MLlib fit: at ≤`maxRows` points × a few dozen
    * centers the entire fit is milliseconds of driver arithmetic, vs one
    * Spark job per Lloyd iteration per k-means (the old shape spent
    * seconds of scheduler round-trips fitting 8 subspace codebooks). */
  private def lloyd(points: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means fit needs a non-empty sample")
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(points.indices.toVector).distinct.take(k)
    val centers = Array.tabulate(math.min(k, points.length))(i =>
      points(init(i)).clone())
    val assign = new Array[Int](points.length)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var p = 0
      while (p < points.length) {
        val v = points(p)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centers.length) {
          var d = 0.0; var i = 0
          val ctr = centers(c)
          while (i < dim) { val t = v(i) - ctr(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(p) != best) { assign(p) = best; moved = true }
        p += 1
      }
      val sums = Array.ofDim[Double](centers.length, dim)
      val counts = new Array[Int](centers.length)
      var p2 = 0
      while (p2 < points.length) {
        val v = points(p2); val c = assign(p2)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
        p2 += 1
      }
      var c2 = 0
      while (c2 < centers.length) {
        if (counts(c2) > 0) {
          var i = 0
          while (i < dim) { centers(c2)(i) = sums(c2)(i) / counts(c2); i += 1 }
        } else {
          // empty cluster: re-seed to the sample point farthest from its
          // current center (deterministic — no rand() mid-fit)
          var worstP = 0; var worstD = -1.0
          var p3 = 0
          while (p3 < points.length) {
            val v = points(p3); val ctr = centers(assign(p3))
            var d = 0.0; var i = 0
            while (i < dim) { val t = v(i) - ctr(i); d += t * t; i += 1 }
            if (d > worstD) { worstD = d; worstP = p3 }
            p3 += 1
          }
          centers(c2) = points(worstP).clone()
          moved = true
        }
        c2 += 1
      }
      iter += 1
    }
    centers
  }

  def ivfFit(df: DataFrame, vecCol: String = "embedding",
      numCells: Int = 16, seed: Long = 42L,
      fitSampleFraction: Double = 1.0,
      maxIter: Int = 10, maxFitRows: Int = 100000): IvfIndex = {
    // k-means centroids converge on a sample: at 100 TB fitting on the full
    // corpus would iterate the whole dataset per k-means step, while a few
    // hundred points per target cell give statistically identical centers.
    // The assignment pass (the part that must see every row) stays full.
    // IVF cells only need to be approximately Voronoi — probe recall, not
    // centroid convergence, is the quality metric, and it plateaus within
    // a few iterations.
    IvfIndex(lloyd(
      fitSample(df, vecCol, fitSampleFraction, seed, maxFitRows),
      numCells, seed, maxIter))
  }

  case class IvfIndex(centers: Array[Array[Double]]) {

    /** Assign each row to its cell (write `partitionBy("cell")` at scale).
      * Native nearest-centroid expression, NOT `model.transform`: the
      * MLlib path is a per-row UDF plus an array→Vector conversion per
      * row — the assignment pass is the one that must see every row at
      * 100 TB, so it stays a codegen'd narrow map like every other kernel
      * here. */
    def assign(df: DataFrame, vecCol: String = "embedding"): DataFrame =
      df.withColumn("cell", V.nearestCenter(col(vecCol), centers))

    /** The `nProbes` cells nearest to the query (driver-side — centers are
      * a tiny array). */
    private def probeCells(query: Seq[Float], nProbes: Int): Seq[Int] = {
      val qc = query.map(_.toDouble).toArray
      centers.zipWithIndex
        .map { case (c, i) =>
          val d = c.zip(qc).map { case (a, b) => (a - b) * (a - b) }.sum
          (i, d)
        }
        .sortBy(_._2).take(nProbes).map(_._1).toSeq
    }

    /** ANN top-k probing the `nProbes` nearest cells to the query. */
    def topK(df: DataFrame, query: Seq[Float], k: Int = 10,
        vecCol: String = "embedding", idCol: String = "vec_id",
        nProbes: Int = 2): DataFrame =
      assign(df, vecCol)
        .filter(col("cell").isInCollection(probeCells(query, nProbes)))
        .select(col(idCol),
          round(V.cosineFused(col(vecCol), V.vectorLit(query)), 4).as("cos"))
        .orderBy(col("cos").desc, col(idCol))
        .limit(k)

    /** Materialize the IVF index: the assigned corpus partitioned by
      * `cell`, so a probe is a partition-pruned read of `nProbes` of
      * `numCells` partitions (same storage story as
      * [[Similarity.writeLshIndex]], but data-adaptive cells and a single
      * copy). */
    def write(df: DataFrame, path: String, vecCol: String = "embedding"): Unit =
      assign(df, vecCol)
        .repartition(col("cell")) // one file per cell dir, not tasks×cells
        .write.mode("overwrite").partitionBy("cell").parquet(path)

    /** Incremental index maintenance: assign a NEW batch with the
      * index's FROZEN centers and append its files into the same
      * cell-partitioned layout — O(batch) work instead of an index
      * rebuild, and the probe path is untouched (partition pruning
      * sees more files in the same cell dirs). Probe equivalence to a
      * full rebuild is EXACT, not approximate: a cell is a pure
      * function of the frozen centers, so append commutes with
      * assignment. What appends do NOT do is adapt the centers —
      * as the corpus distribution drifts, cells imbalance and recall
      * decays; pair with [[graft.operators.Drift]] monitoring on the
      * cell histogram and refit when it alarms (the standard
      * IVF-maintenance recipe). */
    def append(df: DataFrame, path: String, vecCol: String = "embedding"): Unit =
      assign(df, vecCol)
        .repartition(col("cell"))
        .write.mode("append").partitionBy("cell").parquet(path)

    /** ANN top-k against a [[write]]-materialized index: the `cell IN`
      * predicate is on the partition column → pruned at planning time.
      * Identical results to [[topK]] over the same corpus. */
    def topKStored(spark: org.apache.spark.sql.SparkSession, path: String,
        query: Seq[Float], k: Int = 10,
        vecCol: String = "embedding", idCol: String = "vec_id",
        nProbes: Int = 2): DataFrame =
      spark.read.parquet(path)
        .filter(col("cell").isInCollection(probeCells(query, nProbes)))
        .select(col(idCol),
          round(V.cosineFused(col(vecCol), V.vectorLit(query)), 4).as("cos"))
        .orderBy(col("cos").desc, col(idCol))
        .limit(k)
  }

  /** IVF assignment with FIXED md5-derived centroids (see
    * [[graft.functions.VectorFunctions.portableCentroids]]) — the
    * assignment stage of [[ivfFit]] in isolation, pinned cross-engine: the
    * k-means FIT is not SQL-expressible, but nearest-center over known
    * centroids is (argmin of closed-form distances), so this oracles the
    * native [[graft.functions.NearestCenter]] expression — the kernel that
    * must see every row at 100 TB — against an independent engine. */
  def ivfAssignPortable(df: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", numCells: Int = 8, dim: Int = 64): DataFrame =
    df.select(col(idCol),
      V.nearestCenter(col(vecCol), V.portableCentroids(numCells, dim)).as("cell"))

  /** The FULL IVF query path with FIXED md5-derived centroids: assign
    * every row to its nearest cell (the [[ivfAssignPortable]] kernel),
    * select the `nProbes` cells nearest the query driver-side, filter to
    * those cells, exact rounded-cosine top-k — exactly the
    * [[IvfIndex.topK]] pipeline, but with centroids both engines can
    * derive in closed form, so assignment + probe selection + top-k are
    * all hash-checkable cross-engine (argmin + filter + window in SQL).
    * The k-means-fitted [[ivfFit]] stays the production path — data-
    * adaptive cells beat fixed random centroids on recall — this pins the
    * query-path MACHINERY those cells flow through. Probe-cell ties
    * resolve to the lowest cell index on both engines. */
  def ivfTopKPortable(
      df: DataFrame,
      query: Seq[Float],
      k: Int = 20,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      numCells: Int = 8,
      dim: Int = 64,
      nProbes: Int = 3): DataFrame = {
    val centers = V.portableCentroids(numCells, dim)
    val qc = query.map(_.toDouble)
    // driver-side twin of the NearestCenter kernel's distance loop (same
    // ascending-index summation order, so cell ranking matches the
    // executor- and oracle-side arithmetic exactly)
    val probed = centers.zipWithIndex.map { case (c, j) =>
      val n = math.min(c.length, qc.length)
      var d = 0.0
      var i = 0
      while (i < n) { val t = qc(i) - c(i); d += t * t; i += 1 }
      (j, d)
    }.sortBy { case (j, d) => (d, j) }.take(nProbes).map(_._1)
    df.withColumn("cell", V.nearestCenter(col(vecCol), centers))
      .filter(col("cell").isInCollection(probed))
      .select(col(idCol),
        round(V.cosineFused(col(vecCol), V.vectorLit(query)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs top-k join (each left row → its k nearest right rows) via
    * multi-table LSH blocking + windowed rank. A pair is a candidate when
    * the two vectors share a bucket in ANY of `numTables` independent
    * tables (join key = xxhash64(table, bucket), exploded per table):
    * fewer planes per table keep per-table collision probability usable,
    * extra tables compound recall as 1-(1-p^planes)^L — single-table
    * exact-bucket equality missed all but the nearest pairs. Candidates
    * are deduped across tables BEFORE cosine scoring so each surviving
    * pair is scored once. Use for bulk kNN-graph construction; the
    * brute-force equivalent is an O(n²) cross join and intentionally not
    * provided.
    *
    * Skew caps (BOTH ON BY DEFAULT — the production safety rails):
    *   - `maxRightPerKey` — per-(table,bucket) cap on the exploded right
    *     side BEFORE the blocking join. `0` (default) → `200·k`; a
    *     NEGATIVE value disables the cap (and skips its window shuffle
    *     entirely); positive → that exact cap. A bucket larger than the
    *     cap is deterministically hash-sampled, so results on degenerate
    *     mega buckets are a bounded approximation BY DESIGN — pass `-1`
    *     when exact candidate enumeration matters more than bounded
    *     fan-out (e.g. oracled/audit runs on pre-bounded inputs).
    *   - `maxCandidatesPerLeft` — per-left cap on the deduped candidate
    *     list before vectors attach. Same sentinel scheme; default `50·k`.
    *
    * `portable = true` swaps the Gaussian plane tables for integer-exact
    * md5-derived plane tables (namespaces `t0:`, `t1:`, …) and string
    * `"t:bits"` join keys — the SAME pipeline (explode → right cap →
    * blocking join → cross-table dedup → left cap → score → rank), so an
    * external-engine oracle exercises the production code path, caps
    * included. Ranks order by the ROUNDED cosine (4 dp) with an id
    * tiebreak so rank assignment is engine-independent in both modes. */
  def knnJoin(
      left: DataFrame,
      right: DataFrame,
      k: Int = 10,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      numPlanes: Int = 4,
      dim: Int = 64,
      seed: Long = 42L,
      numTables: Int = 8,
      maxCandidatesPerLeft: Int = 0,
      maxRightPerKey: Int = 0,
      portable: Boolean = false): DataFrame = {
    // per-row array of per-table join keys; vec is a plain column ref so
    // the L bucket computations stay one narrow projection
    def keys(vec: Column): Column =
      if (portable)
        array((0 until numTables).map { t =>
          concat(lit(s"$t:"),
            V.portableBucketBits(vec, V.portablePlanes(numPlanes, dim, ns = s"t$t:")))
        }: _*)
      else {
        val tables = planeTables(numTables, numPlanes, dim, seed)
        array(tables.zipWithIndex.map {
          case (planes, t) => xxhash64(lit(t), V.hyperplaneBucket(vec, planes))
        }: _*)
      }
    // candidate generation carries ONLY (key, id): the L-way explode, the
    // blocking join, and the cross-table dedup shuffle 16-byte rows instead
    // of rows dragging two dim-sized vectors (at dim=64 that is ~32× less
    // shuffle width through the skew-prone stage). Vectors are attached
    // afterwards by id-keyed joins against the un-exploded inputs — the
    // same narrow-candidates shape as [[Dedup.candidatePairs]].
    val l = left.select(col(idCol).as("id_l"), col(vecCol).as("v_l"))
    val r = right.select(col(idCol).as("id_r"), col(vecCol).as("v_r"))
    // deterministic per-(table,bucket) cap on the RIGHT side BEFORE the
    // blocking join: one mega bucket (boilerplate-duplicate embeddings —
    // a real 100 TB corpus shape) would otherwise make the join output
    // |left∩bucket|·|bucket| rows per table; the per-left cap below
    // bounds the scoring stage but not that join fan-out. Capping the
    // exploded right to a hash-ordered sample per key bounds it at
    // |left∩bucket|·cap while leaving sub-cap buckets untouched (the
    // normal case — the cap only engages on degenerate buckets). Inside
    // a near-duplicate mega bucket any cap-sized sample carries the same
    // neighbors, so recall is preserved where it matters; xxhash64 order
    // keeps the sample unbiased and reproducible. Cost when no skew
    // exists: a row_number over rows the join was about to shuffle on
    // the same key anyway.
    val rExploded = r.select(col("id_r"), explode(keys(col("v_r"))).as("key"))
    val rCap = if (maxRightPerKey == 0) 200 * k else maxRightPerKey
    val rKeys =
      if (rCap < 0) rExploded // cap disabled: no window, no extra shuffle
      else {
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy(col("key"))
          .orderBy(xxhash64(col("key"), col("id_r")), col("id_r"))
        rExploded
          .withColumn("__rr", row_number().over(wr))
          .filter(col("__rr") <= rCap)
          .drop("__rr")
      }
    val rawCandidates = l.select(col("id_l"), explode(keys(col("v_l"))).as("key"))
      .join(rKeys, "key")
      .filter(col("id_l") =!= col("id_r"))
      .select(col("id_l"), col("id_r"))
      .dropDuplicates("id_l", "id_r")
    // deterministic per-left cap BEFORE vectors are attached: inside one
    // dense cluster every member collides with every other in every table,
    // so a hot left row's candidate list is O(cluster²)-ish — unbounded,
    // it drags that many dim-sized vector pairs into one scoring window
    // partition. Capping on the slim (id_l, id_r) pairs is a spillable
    // 16-byte-row sort; hash order (not id order) keeps the kept subset
    // unbiased, and xxhash64(id_l, id_r) keeps it reproducible across
    // runs — rand() would make recall flap. Default cap 50·k keeps ≥0.5
    // recall with a wide margin (the adversarial-cluster spec pins it).
    val cap = if (maxCandidatesPerLeft == 0) 50 * k else maxCandidatesPerLeft
    val candidates =
      if (cap < 0) rawCandidates // cap disabled
      else {
        val wc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id_l"))
          .orderBy(xxhash64(col("id_l"), col("id_r")), col("id_r"))
        rawCandidates
          .withColumn("__cr", row_number().over(wc))
          .filter(col("__cr") <= cap)
          .drop("__cr")
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_l")).orderBy(col("cos").desc, col("id_r"))
    candidates
      .join(l, "id_l")
      .join(r, "id_r")
      .withColumn("cos", round(V.cosineFused(col("v_l"), col("v_r")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id_l"), col("id_r"), col("cos"), col("rank"))
  }

  /** Contrastive training-pair mining — the self-supervised batch
    * builder: every vector becomes an anchor with a POSITIVE (its most
    * similar LSH-blocked neighbor) and a NEGATIVE (a deterministic
    * pseudo-random partner), the `(anchor, pos, neg)` triplets a
    * contrastive or triplet-loss fine-tune consumes.
    *
    *   - Positives come from the portable hyperplane blocking
    *     ([[graft.operators.Dedup.embeddingPortableCandidates]] — single
    *     corpus scan, hot-bucket guarded, never all-pairs): per anchor,
    *     the candidate with the highest ROUNDED cosine (4 dp; id
    *     tie-break, so rank assignment is engine-independent). Anchors
    *     whose bucket has no other member yield no triplet — by design:
    *     a positive below LSH-collision similarity would be noise.
    *   - Negatives pair each id with its cyclic successor in md5 hash
    *     order WITHIN one of `negBuckets` hash buckets — deterministic,
    *     reproducible, and fully parallel (each bucket windows
    *     independently over slim (id, hash) rows; no global sort). Size
    *     `negBuckets` so buckets hold ≫1 id — a singleton bucket would
    *     pair an id with itself and is dropped. A negative is random BY
    *     DESIGN (the standard in-batch-negative recipe); the rare
    *     hash-neighbor that happens to be semantically close is the
    *     usual false-negative noise contrastive training tolerates.
    *
    * Both sides are closed-form md5 arithmetic, so the full triplet
    * relation (ids AND both rounded cosines) is hash-checkable
    * cross-engine. `numPlanes = 0` (default) sizes the blocking for
    * constant expected occupancy
    * ([[graft.operators.Dedup.adaptiveNumPlanes]]) — candidate volume,
    * and with it scoring work, stays linear in the corpus instead of
    * quadratic at a fixed bucket count. */
  def contrastivePairs(df: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", dim: Int = 64, numPlanes: Int = 0,
      negBuckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cand = graft.operators.Dedup
      .embeddingPortableCandidates(df, vecCol, idCol, dim, numPlanes)
    val sym = cand.select(col("id_a").as("anchor_id"), col("id_b").as("cand_id"))
      .unionByName(cand.select(col("id_b").as("anchor_id"), col("id_a").as("cand_id")))
    val wPos = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_pos").desc, col("cand_id"))
    val pos = sym
      .join(ids.select(col("id").as("anchor_id"), col("vec").as("va")), "anchor_id")
      .join(ids.select(col("id").as("cand_id"), col("vec").as("vb")), "cand_id")
      .withColumn("cos_pos", round(V.cosineFused(col("va"), col("vb")), 4))
      .withColumn("__r", row_number().over(wPos))
      .filter(col("__r") === 1)
      .select(col("anchor_id"), col("cand_id").as("pos_id"), col("cos_pos"))
    // hex-prefix hash buckets: mod on the first 8 md5 hex chars keeps the
    // bucket count free (16 would pin it to one hex digit)
    val h = md5(concat(lit("neg:"), col("id").cast("string")))
    val bkt = conv(substring(h, 1, 8), 16, 10).cast("long") % negBuckets
    val wNeg = Window.partitionBy(col("__b")).orderBy(col("__h"), col("id"))
    val wNegFull = wNeg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val neg = ids.select(col("id"), h.as("__h"), bkt.as("__b"))
      .withColumn("__next", lead(col("id"), 1).over(wNeg))
      .withColumn("__first", first(col("id")).over(wNegFull))
      .select(col("id").as("anchor_id"),
        coalesce(col("__next"), col("__first")).as("neg_id"))
      .filter(col("neg_id") =!= col("anchor_id")) // singleton bucket
    pos.join(neg, "anchor_id")
      .join(ids.select(col("id").as("anchor_id"), col("vec").as("va2")), "anchor_id")
      .join(ids.select(col("id").as("neg_id"), col("vec").as("vn")), "neg_id")
      .withColumn("cos_neg", round(V.cosineFused(col("va2"), col("vn")), 4))
      .select(col("anchor_id"), col("pos_id"), col("neg_id"),
        col("cos_pos"), col("cos_neg"))
  }

  /** Hard-negative triplet mining — the stronger curriculum the random
    * negatives of [[contrastivePairs]] can't provide: per anchor, the
    * POSITIVE is its most similar blocked candidate and the HARD
    * NEGATIVE its most similar candidate BELOW `dupThreshold` — close
    * enough to be confusable (it collided in an LSH bucket), yet
    * dissimilar enough that it is not a duplicate of the anchor. This
    * is the standard ANN-mined hard-negative recipe (dense-retrieval
    * training): negatives from the model's own near-miss region, not
    * uniform noise.
    *
    * Scale shape — work is bounded PER ANCHOR, twice over:
    *
    *   1. Candidates come from the same single-scan, hot-bucket-guarded
    *      hyperplane blocking as every embedding-dedup family — never
    *      all-pairs — and `numPlanes = 0` (default) sizes the bucket
    *      space for constant expected occupancy
    *      ([[graft.operators.Dedup.adaptiveNumPlanes]]): candidate
    *      volume grows ~linearly with the corpus instead of
    *      quadratically at a fixed bucket count (the pre-round-9 shape
    *      measured 118.9× cost for 10× data in the sf10 soak).
    *   2. `maxCandidatesPerAnchor` (default 64) caps each anchor's
    *      scored candidates on the SLIM `(anchor, cand)` relation,
    *      before any vector is attached — a dense clique (one mega
    *      bucket of near-identical vectors) costs each of its anchors
    *      64 cosines, not |clique|. The kept subset is chosen by
    *      md5(anchor:cand) order: deterministic, engine-replayable, and
    *      unbiased w.r.t. similarity (a similarity-biased cap would
    *      skew the hard-negative curriculum toward whatever the
    *      blocking already over-samples). ≤ 0 disables the cap. The
    *      positive/hard-negative argmaxes then read "best among the
    *      capped candidates" — at sane occupancy (adaptive planes) the
    *      cap only engages inside dense cliques, where near-ties make
    *      any 64-subset's argmax an equally good curriculum pick.
    *
    * Each surviving candidate's cosine is scored ONCE into a
    * checkpointed slim `(anchor, cand, cos)` relation that both window
    * passes (positive pick, hard-negative pick) read; output is anchors
    * that have BOTH a positive and a sub-threshold hard negative.
    * Rounded cosines + id tie-breaks keep both argmaxes
    * engine-independent, so the whole triplet relation is
    * hash-checkable cross-engine. */
  def contrastiveHardTriplets(df: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", dim: Int = 64, numPlanes: Int = 0,
      dupThreshold: Double = 0.98,
      maxCandidatesPerAnchor: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cand = graft.operators.Dedup
      .embeddingPortableCandidates(df, vecCol, idCol, dim, numPlanes)
    val sym = cand.select(col("id_a").as("anchor_id"), col("id_b").as("cand_id"))
      .unionByName(cand.select(col("id_b").as("anchor_id"), col("id_a").as("cand_id")))
    val capped =
      if (maxCandidatesPerAnchor <= 0) sym
      else {
        val wCap = Window.partitionBy(col("anchor_id"))
          .orderBy(md5(concat(lit("hn:"), col("anchor_id").cast("string"),
            lit(":"), col("cand_id").cast("string"))), col("cand_id"))
        sym.withColumn("__c", row_number().over(wCap))
          .filter(col("__c") <= maxCandidatesPerAnchor)
          .drop("__c")
      }
    val scored = capped
      .join(ids.select(col("id").as("anchor_id"), col("vec").as("va")), "anchor_id")
      .join(ids.select(col("id").as("cand_id"), col("vec").as("vb")), "cand_id")
      .withColumn("cos", round(V.cosineFused(col("va"), col("vb")), 4))
      .select("anchor_id", "cand_id", "cos")
      .localCheckpoint(true) // scored once; two window passes read it
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    val pos = scored.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("anchor_id"), col("cand_id").as("pos_id"),
        col("cos").as("cos_pos"))
    val hard = scored.filter(col("cos") < dupThreshold)
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("anchor_id"), col("cand_id").as("hard_neg_id"),
        col("cos").as("cos_neg"))
    pos.join(hard, "anchor_id")
  }

  // ---- Product quantization (PQ) -------------------------------------------

  /** Product-quantization index: `m` subspace codebooks of `ksub`
    * centroids each. A `dim`-float vector compresses to `m` small codes
    * (one byte each at `ksub ≤ 256`) — at 100 TB the difference between
    * an ANN sweep reading 256 B/vector of floats and 8 B/vector of
    * codes, which is what lets the scored set live in memory while the
    * float vectors stay on disk for the final exact re-rank.
    *
    * Query-side scoring is asymmetric distance (ADC): the query computes
    * one `m × ksub` table of exact subspace distances driver-side, and
    * each encoded vector scores as `m` table lookups — no float math per
    * row at all. Encode is the [[graft.functions.NearestCenter]] native
    * kernel per subspace over `slice`d vectors (the same
    * ascending-index, lowest-tie argmin the IVF oracle pinned), so the
    * whole encode+score pipeline is engine-reproducible when the
    * codebooks are ([[pqPortable]]). */
  case class PqIndex(codebooks: Array[Array[Array[Double]]]) {
    val m: Int = codebooks.length
    val subDim: Int = codebooks.head.head.length

    /** `(idCol, codes)` — the compressed corpus representation:
      * `codes[s]` = nearest centroid of subspace `s` (0-based, ties to
      * the lowest index). One narrow codegen'd map, no shuffle. */
    def encode(df: DataFrame, vecCol: String = "embedding",
        idCol: String = "vec_id"): DataFrame =
      df.select(col(idCol), array((0 until m).map(s =>
        V.nearestCenter(slice(col(vecCol), s * subDim + 1, subDim),
          codebooks(s))): _*).as("codes"))

    /** Exact squared-L2 table `table(s)(j)` between the query's subspace
      * `s` and centroid `j` — ascending-index summation, the driver twin
      * of the kernel arithmetic. */
    private def adcTable(query: Seq[Float]): Array[Array[Double]] =
      codebooks.zipWithIndex.map { case (cb, s) =>
        cb.map { c =>
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val t = query(s * subDim + i).toDouble - c(i)
            d += t * t
            i += 1
          }
          d
        }
      }

    /** ADC scoring of an already-encoded `(id, codes)` relation — the
      * shared body of the in-memory and stored-index probes. */
    private def scoreCodes(codesDf: DataFrame, query: Seq[Float], k: Int,
        idCol: String): DataFrame = {
      val tab = typedlit(adcTable(query).map(_.toSeq).toSeq)
      codesDf
        .withColumn("adc", round(
          aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
            (acc, s) => acc + tab(s)(col("codes")(s))), 4))
        .select(col(idCol), col("adc"))
        .orderBy(col("adc"), col(idCol))
        .limit(k)
    }

    /** ADC top-k: smallest approximate distance first, id tiebreak on the
      * ROUNDED (4 dp) score so ranking is engine-independent. The scored
      * relation carries only `(id, codes)`; at scale, persist
      * [[encode]]'s output ([[write]]) and this never touches the float
      * vectors. */
    def topK(df: DataFrame, query: Seq[Float], k: Int = 10,
        vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
      scoreCodes(encode(df, vecCol, idCol), query, k, idCol)

    /** The production PQ search: ADC shortlists `rerankFactor·k`
      * candidates from codes alone, then ONLY those rows fetch their
      * float vectors for an exact rounded-cosine re-rank. Codes are lossy
      * — pure ADC ranking reshuffles near-ties — so the shortlist buys
      * back exactness while the expensive per-float work stays bounded at
      * `rerankFactor·k` rows regardless of corpus size. */
    def topKReranked(df: DataFrame, query: Seq[Float], k: Int = 10,
        rerankFactor: Int = 5, vecCol: String = "embedding",
        idCol: String = "vec_id"): DataFrame =
      rerank(topK(df, query, k * rerankFactor, vecCol, idCol),
        df, query, k, vecCol, idCol)

    /** Exact-cosine re-rank of an ADC shortlist: the tiny shortlist
      * BROADCASTS against one corpus scan, so per-float work is bounded
      * at the shortlist size regardless of corpus volume. */
    private def rerank(shortlist: DataFrame, floats: DataFrame,
        query: Seq[Float], k: Int, vecCol: String, idCol: String): DataFrame =
      shortlist
        .join(floats.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col(idCol),
          round(V.cosineFused(col(vecCol), V.vectorLit(query)), 4).as("cos"))
        .orderBy(col("cos").desc, col(idCol))
        .limit(k)

    /** Materialize the PQ index: the codebooks (tiny — `m·ksub` rows)
      * plus the encoded corpus as a plain `(id, codes)` parquet. THE
      * point of PQ at 100 TB: the stored artifact is ~`m` bytes/vector
      * (vs `4·dim` of floats), so the whole ranking stage reads a table
      * two orders of magnitude smaller than the corpus; the float
      * vectors are touched only by the re-rank join's broadcast probe.
      * Codebooks are written FIRST so a `_SUCCESS` in `codes/` implies a
      * complete index. */
    def write(df: DataFrame, path: String, vecCol: String = "embedding",
        idCol: String = "vec_id"): Unit = {
      val spark = df.sparkSession
      import spark.implicits._
      codebooks.zipWithIndex.flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
      }.toSeq.toDF("s", "j", "center")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
      encode(df, vecCol, idCol)
        .write.mode("overwrite").parquet(s"$path/codes")
    }

    /** O(batch) maintenance for a [[write]]-materialized index: encode
      * ONLY the new vectors with this index's codebooks and append
      * their `(id, codes)` rows — a code is a pure function of the
      * vector and the FROZEN codebooks, so append ≡ full re-encode
      * exactly (the PQ member of the frozen-parameter append family:
      * IVF cells, inverted/positional postings). The stored codebooks
      * are the index's identity: this method REFUSES to append when
      * its own codebooks differ from the stored ones (an append under
      * different codebooks would silently corrupt every ADC score —
      * rehydrate with [[pqLoad]] to be safe by construction). Caller
      * contract: batch ids must be new. */
    def append(df: DataFrame, path: String, vecCol: String = "embedding",
        idCol: String = "vec_id"): Unit = {
      val stored = pqLoad(df.sparkSession, path)
      require(stored.codebooks.length == m &&
          stored.codebooks.zip(codebooks).forall { case (a, b) =>
            a.length == b.length &&
              a.zip(b).forall { case (x, y) => x.sameElements(y) } },
        s"append refused: this PqIndex's codebooks differ from the stored index at $path " +
          "(encode under different codebooks corrupts ADC scores; rehydrate with pqLoad)")
      encode(df, vecCol, idCol)
        .write.mode("append").parquet(s"$path/codes")
    }

    /** ADC top-k against a [[write]]-materialized index: reads ONLY the
      * slim codes table — no float vector is scanned anywhere. */
    def topKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
        query: Seq[Float], k: Int = 10, idCol: String = "vec_id"): DataFrame =
      scoreCodes(spark.read.parquet(s"$path/codes"), query, k, idCol)

    /** [[topKReranked]] against a stored index: ADC shortlist from the
      * codes table, exact-cosine re-rank against the float corpus. */
    def topKIndexedReranked(spark: org.apache.spark.sql.SparkSession,
        path: String, floats: DataFrame, query: Seq[Float], k: Int = 10,
        rerankFactor: Int = 5, vecCol: String = "embedding",
        idCol: String = "vec_id"): DataFrame =
      rerank(topKIndexed(spark, path, query, k * rerankFactor, idCol),
        floats, query, k, vecCol, idCol)
  }

  /** Rehydrate a [[PqIndex]] from a [[PqIndex.write]] directory (the
    * codebooks parquet — tiny, collected driver-side). */
  def pqLoad(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .select("s", "j", "center").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
      .toMap
    val m = rows.keys.map(_._1).max + 1
    val ksub = rows.keys.map(_._2).max + 1
    PqIndex(Array.tabulate(m, ksub)((s, j) => rows((s, j))))
  }

  /** Fit PQ codebooks: an independent k-means per subspace over the
    * `slice`d sample (random init + bounded Lloyd iterations — the
    * [[ivfFit]] rationale: code quality plateaus in a few passes and the
    * fit runs on a sample; ENCODE is the pass that must see every row,
    * and it stays the native kernel). */
  def pqFit(df: DataFrame, vecCol: String = "embedding",
      m: Int = 8, ksub: Int = 16, dim: Int = 64, seed: Long = 42L,
      fitSampleFraction: Double = 1.0, maxIter: Int = 10,
      maxFitRows: Int = 100000): PqIndex = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sample = fitSample(df, vecCol, fitSampleFraction, seed, maxFitRows)
    PqIndex(pqFitSample(sample, m, ksub, dim / m, seed, maxIter))
  }

  /** The m independent per-subspace Lloyd fits over an already-collected
    * sample — ONE pass over the driver array per subspace slice, shared
    * by [[pqFit]] (raw vectors) and [[ivfPqFit]] (residuals). */
  private def pqFitSample(sample: Array[Array[Double]], m: Int, ksub: Int,
      subDim: Int, seed: Long, maxIter: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m) { s =>
      val slices = sample.map(v =>
        java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      lloyd(slices, ksub, seed + s, maxIter)
    }

  /** The fixed md5-codebook PQ index (see
    * [[graft.functions.VectorFunctions.pqPortableCodebooks]]) — the
    * oracle/audit path; [[pqFit]] is the production path. */
  def pqPortable(m: Int = 8, ksub: Int = 16, subDim: Int = 8): PqIndex =
    PqIndex(V.pqPortableCodebooks(m, ksub, subDim))

  // ---- IVF-PQ (coarse cells + residual product quantization) ---------------

  /** The billion-scale composite layout (IVFADC, Jégou et al. 2011,
    * "Product Quantization for Nearest Neighbor Search"): a coarse
    * quantizer routes each vector to a cell, and PQ encodes the RESIDUAL
    * `vec − coarse[cell]` — residuals concentrate near zero, so the same
    * codebook budget quantizes them far more finely than raw vectors.
    * Stored partitioned by cell, a probe is a partition-pruned read of
    * `nProbes` directories containing ~`m` bytes/vector of codes: the two
    * reductions compound — read `nProbes/numCells` of the corpus, at
    * 1/32nd the width — which is what makes ANN over 100 TB of vectors an
    * interactive query instead of a scan.
    *
    * All arithmetic is double end to end (residuals via `zip_with`
    * promote to double, encode via the [[graft.functions.NearestCenter]]
    * double kernel, query tables driver-side in the same ascending
    * order), so with fixed portable centroids+codebooks the ENTIRE
    * route→residual→encode→probe→ADC pipeline is closed-form replayable
    * by an external engine ([[ivfPqPortable]]). */
  case class IvfPqIndex(coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]) {
    val numCells: Int = coarse.length
    val m: Int = codebooks.length
    val subDim: Int = codebooks.head.head.length

    private def coarseLit: Column = typedlit(coarse.map(_.toSeq).toSeq)

    /** `(id, cell, codes)` — route to the nearest coarse cell, PQ-encode
      * the residual. One narrow map over the scan (two native-kernel
      * passes + a `zip_with`), no shuffle. */
    def encode(df: DataFrame, vecCol: String = "embedding",
        idCol: String = "vec_id"): DataFrame =
      df.withColumn("cell", V.nearestCenter(col(vecCol), coarse))
        .withColumn("__res", zip_with(col(vecCol),
          element_at(coarseLit, col("cell") + 1), (a, b) => a - b))
        .select(col(idCol), col("cell"), array((0 until m).map(s =>
          V.nearestCenter(slice(col("__res"), s * subDim + 1, subDim),
            codebooks(s))): _*).as("codes"))

    /** The `nProbes` cells nearest the query — driver-side twin of the
      * kernel's ascending-index distance loop, ties to the lowest cell. */
    private def probeCells(query: Seq[Float], nProbes: Int): Seq[Int] = {
      val qc = query.map(_.toDouble)
      coarse.zipWithIndex.map { case (c, j) =>
        val n = math.min(c.length, qc.length)
        var d = 0.0
        var i = 0
        while (i < n) { val t = qc(i) - c(i); d += t * t; i += 1 }
        (j, d)
      }.sortBy { case (j, d) => (d, j) }.take(nProbes).map(_._1).toSeq
    }

    /** Exact `m × ksub` subspace-distance table between the query's
      * residual w.r.t. `cell` and that subspace's codebook. */
    private def cellAdcTable(query: Seq[Float], cell: Int): Array[Array[Double]] = {
      val ctr = coarse(cell)
      codebooks.zipWithIndex.map { case (cb, s) =>
        cb.map { c =>
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val qr = query(s * subDim + i).toDouble - ctr(s * subDim + i)
            val t = qr - c(i)
            d += t * t
            i += 1
          }
          d
        }
      }
    }

    /** ADC scoring of an encoded `(id, cell, codes)` relation restricted
      * to the probed cells: each probed cell gets its own query table
      * (residuals are cell-relative), selected per row by a `when` chain
      * — still zero per-row float math, `m` lookups + `nProbes`
      * comparisons. */
    private def scoreCodes(codesDf: DataFrame, query: Seq[Float], k: Int,
        nProbes: Int, idCol: String): DataFrame = {
      val probed = probeCells(query, nProbes)
      val perCell = probed.map { c =>
        val t = typedlit(cellAdcTable(query, c).map(_.toSeq).toSeq)
        c -> aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, s) => acc + t(s)(col("codes")(s)))
      }
      val adc = perCell.tail.foldLeft(
        when(col("cell") === perCell.head._1, perCell.head._2)) {
        case (acc, (c, e)) => acc.when(col("cell") === c, e)
      }
      codesDf
        .filter(col("cell").isInCollection(probed))
        .withColumn("adc", round(adc, 4))
        .select(col(idCol), col("adc"))
        .orderBy(col("adc"), col(idCol))
        .limit(k)
    }

    /** ADC top-k over the `nProbes` nearest cells: smallest approximate
      * distance first, id tiebreak on the rounded score. */
    def topK(df: DataFrame, query: Seq[Float], k: Int = 10,
        vecCol: String = "embedding", idCol: String = "vec_id",
        nProbes: Int = 3): DataFrame =
      scoreCodes(encode(df, vecCol, idCol), query, k, nProbes, idCol)

    /** ADC shortlist → exact rounded-cosine re-rank (same bounded-float
      * shape as [[PqIndex.topKReranked]]: the shortlist broadcasts). */
    def topKReranked(df: DataFrame, query: Seq[Float], k: Int = 10,
        rerankFactor: Int = 5, vecCol: String = "embedding",
        idCol: String = "vec_id", nProbes: Int = 3): DataFrame =
      topK(df, query, k * rerankFactor, vecCol, idCol, nProbes)
        .join(df.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col(idCol),
          round(V.cosineFused(col(vecCol), V.vectorLit(query)), 4).as("cos"))
        .orderBy(col("cos").desc, col(idCol))
        .limit(k)

    /** Materialize: codes partitioned by cell (one file per cell dir),
      * codebooks+coarse alongside. A stored probe reads `nProbes` of
      * `numCells` partition directories of ~`m`-byte rows — partition
      * pruning AND column-width reduction compound. */
    def write(df: DataFrame, path: String, vecCol: String = "embedding",
        idCol: String = "vec_id"): Unit = {
      val spark = df.sparkSession
      import spark.implicits._
      codebooks.zipWithIndex.flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
      }.toSeq.toDF("s", "j", "center")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
      coarse.toSeq.zipWithIndex.map { case (c, j) => (j, c.toSeq) }
        .toDF("j", "center")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/coarse")
      encode(df, vecCol, idCol)
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    }

    /** Probe a [[write]]-materialized index: the `cell IN` predicate is
      * on the partition column → pruned at planning time; only the probed
      * cells' code files are read. */
    def topKStored(spark: org.apache.spark.sql.SparkSession, path: String,
        query: Seq[Float], k: Int = 10, idCol: String = "vec_id",
        nProbes: Int = 3): DataFrame =
      scoreCodes(spark.read.parquet(s"$path/codes"), query, k, nProbes, idCol)
  }

  /** Fit IVF-PQ: coarse k-means cells ([[ivfFit]] — sampled fit, bounded
    * Lloyd), then per-subspace k-means over the RESIDUALS of the fit
    * sample. Encode — the pass that must see every row — stays the
    * native double kernel. */
  def ivfPqFit(df: DataFrame, vecCol: String = "embedding",
      numCells: Int = 8, m: Int = 8, ksub: Int = 16, dim: Int = 64,
      seed: Long = 42L, fitSampleFraction: Double = 1.0,
      maxIter: Int = 10, maxFitRows: Int = 100000): IvfPqIndex = {
    // ONE bounded sample collect feeds both fits: coarse Lloyd over the
    // raw vectors, then the residual of each sample point against its
    // nearest coarse center (driver arithmetic — the full-corpus residual
    // pass happens only inside encode, as a narrow map), then the m
    // per-subspace codebook fits over those residuals.
    val sample = fitSample(df, vecCol, fitSampleFraction, seed, maxFitRows)
    val coarse = lloyd(sample, numCells, seed, maxIter)
    val residuals = sample.map { v =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < coarse.length) {
        var d = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - coarse(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val ctr = coarse(best)
      Array.tabulate(v.length)(i => v(i) - ctr(i))
    }
    IvfPqIndex(coarse, pqFitSample(residuals, m, ksub, dim / m, seed, maxIter))
  }

  /** The fixed md5 IVF-PQ index — the oracle/audit path; [[ivfPqFit]] is
    * the production path. Namespaces are scaled to the test-embedding
    * geometry (coarse `ivfq:` ±0.25, residual `pqr:` ±0.125): with the
    * ±1 `ivf:` centroids the residual cloud sits far outside the
    * codebook's dispersion and ONE entry wins every per-subspace argmin
    * — constant codes, a vacuous oracle. At these scales every sf0.001
    * row gets a distinct (cell, codes) combination, so the hash check
    * genuinely exercises routing, residuals, and per-cell table lookup. */
  def ivfPqPortable(numCells: Int = 8, m: Int = 8, ksub: Int = 16,
      dim: Int = 64): IvfPqIndex =
    IvfPqIndex(V.portableCentroids(numCells, dim, ns = "ivfq", mod = 501),
      V.pqPortableCodebooks(m, ksub, dim / m, ns = "pqr", mod = 251))
}
