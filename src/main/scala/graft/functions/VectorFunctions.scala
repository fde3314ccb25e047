package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` (the
  * `embeddings.embedding` column shape).
  *
  * Built from `zip_with`/`aggregate` higher-order functions: codegen'd,
  * null-safe, and shuffle-free — a cosine over 100 TB of vectors is a
  * narrow map stage. Accumulation is in double precision regardless of the
  * input element type so scores are stable.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** cosine(a, b) ∈ [-1, 1]; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** A vector literal usable against an `array<float>` column. */
  def vectorLit(v: Seq[Float]): Column =
    array(v.map(x => lit(x)): _*)

  /** Random-hyperplane LSH bucket id: `planes.size` sign bits packed into a
    * long. Vectors with high cosine land in the same bucket with
    * probability 1 - θ/π per bit (Charikar 2002) — the blocking key for
    * [[graft.operators.Similarity]] and embedding near-dup. Planes must be
    * generated with a fixed seed so the bucketing is deterministic. */
  def hyperplaneBucket(vec: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, vectorLit(p)) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic unit-ish hyperplanes (seeded Gaussian). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
  }
}
