package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two `array<float>` columns — one tight
  * loop, no intermediate array. The compositional [[VectorFunctions.cosine]]
  * (`zip_with` + `aggregate`) allocates a zipped array per comparison and
  * evaluates three lambda chains; in pairwise scoring (the inner loop of
  * every ANN/near-dup operator, millions of pairs at scale) the fused
  * kernel is the difference between memory-bound and compute-bound. The
  * accumulation order matches the compositional form exactly (dot and both
  * norms summed left-to-right in doubles), so results are bit-identical
  * and the DuckDB oracles still hash-match. */
case class CosineSimFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<float>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelImpl.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernelImpl.cosineF($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimFloat = copy(left = newLeft, right = newRight)
}

/** Fused integer dot product over two integral arrays (`array<tinyint>`
  * / `array<int>` / `array<long>`, sides may differ — the quantized
  * index stores tinyint while a driver-quantized query literal arrives
  * as int). One tight loop accumulating in long, no intermediate zipped
  * array: quantized-cosine scoring is the inner loop of the int8 ANN
  * path, where the compositional `zip_with`+`aggregate` form allocates
  * per pair ([[CosineSimFloat]] rationale, integer edition). Exact
  * integer math — bit-identical to the compositional
  * `zip_with`+`aggregate` form ON ITS CONTRACT: null-free arrays of
  * equal length (what every quantization producer here emits, so the
  * DuckDB oracles still hash-match). Outside that contract the edge
  * semantics differ by design of the tight loop: a null ELEMENT reads
  * as 0 where the compositional form yields NULL, and unequal lengths
  * dot the common prefix where `zip_with`'s null padding yields NULL —
  * callers feeding hand-built arrays own that precondition. */
case class DotIntegral(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType}

  private def elemWidth(t: DataType): Int = t match {
    case ArrayType(ByteType, _) => 1
    case ArrayType(IntegerType, _) => 4
    case ArrayType(LongType, _) => 8
    case _ => 0
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemWidth(left.dataType) > 0 && elemWidth(right.dataType) > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_integral requires integral arrays, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_integral"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelImpl.dotIntegral(a.asInstanceOf[ArrayData],
      elemWidth(left.dataType), b.asInstanceOf[ArrayData],
      elemWidth(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernelImpl.dotIntegral($a, " +
        s"${elemWidth(left.dataType)}, $b, ${elemWidth(right.dataType)})")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotIntegral = copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment: index of the closest center (squared
  * euclidean) for an `array<float>` OR `array<double>` vector — the IVF
  * assignment pass as one native expression instead of MLlib's per-row
  * UDF + Vector conversion. The double variant exists for IVF-PQ
  * residuals (`vec - coarse_centroid[cell]`, double arithmetic end to
  * end so the oracle replays it exactly). Ties resolve to the lowest
  * index, like k-means `findClosest`. */
case class NearestCenter(child: Expression, centers: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_center requires array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "nearest_center"

  private lazy val isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    if (isDouble) VectorKernelImpl.nearestD(input.asInstanceOf[ArrayData], centers)
    else VectorKernelImpl.nearest(input.asInstanceOf[ArrayData], centers)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centers", centers, "double[][]")
    val kernel = if (isDouble) "nearestD" else "nearest"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernelImpl.$kernel($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCenter =
    copy(child = newChild)
}

object VectorKernelImpl {
  /** Kernel for [[NearestCenter]]. */
  def nearest(v: ArrayData, centers: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      val n = math.min(v.numElements(), ctr.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - ctr(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** [[nearest]] over `array<double>` input — identical loop and
    * tie-break, double reads (IVF-PQ residual encoding). */
  def nearestD(v: ArrayData, centers: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      val n = math.min(v.numElements(), ctr.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getDouble(i) - ctr(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Kernel for [[DotIntegral]]: Σ aᵢ·bᵢ over the common prefix, reads
    * dispatched on element width (1 = byte, 4 = int, 8 = long),
    * accumulated in long. */
  def dotIntegral(a: ArrayData, aw: Int, b: ArrayData, bw: Int): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val x = aw match {
        case 1 => a.getByte(i).toLong
        case 4 => a.getInt(i).toLong
        case _ => a.getLong(i)
      }
      val y = bw match {
        case 1 => b.getByte(i).toLong
        case 4 => b.getInt(i).toLong
        case _ => b.getLong(i)
      }
      s += x * y
      i += 1
    }
    s
  }

  /** Cosine over float arrays; norms over each full array, dot over the
    * common prefix (vectors are expected to share a dimension). 0.0 when
    * either norm is zero — same guard as the compositional form. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    var qa = 0.0; i = 0
    while (i < na) { val x = a.getFloat(i).toDouble; qa += x * x; i += 1 }
    var qb = 0.0; i = 0
    while (i < nb) { val x = b.getFloat(i).toDouble; qb += x * x; i += 1 }
    val denom = math.sqrt(qa) * math.sqrt(qb)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

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

  /** cosine(a, b) ∈ [-1, 1]; 0 when either vector is all-zero.
    * Compositional (any numeric element type, SQL-expressible shape);
    * hot pairwise paths use [[cosineFused]]. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Fused-kernel cosine for `array<float>` columns (bit-identical to
    * [[cosine]] — see [[CosineSimFloat]]). */
  def cosineFused(a: Column, b: Column): Column =
    Bridge.column(CosineSimFloat(Bridge.expression(a), Bridge.expression(b)))

  /** Index of the nearest centroid (see [[NearestCenter]]). */
  def nearestCenter(vec: Column, centers: Array[Array[Double]]): Column =
    Bridge.column(NearestCenter(Bridge.expression(vec), centers))

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

  // ---- int8 quantization ---------------------------------------------------
  // Symmetric linear quantization: q_i = round(x_i · 127 / max|x|), so the
  // stored vector is 4× smaller (int8 domain; stored as int for arithmetic
  // headroom) and the dot product becomes exact integer math. At 100 TB of
  // embeddings this is the difference between a 25 TB and a 100 TB ANN
  // index — candidate scoring reads a quarter of the bytes, and the final
  // exact re-rank can fetch full floats for the top candidates only.
  // Deterministic and engine-portable (round-half-away ties on integral
  // doubles), so the whole path is DuckDB-oracled.

  /** Quantization scale `127 / max|x|` (0.0 for the all-zero vector). */
  def quantScale(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x.cast("double"))))
    when(maxAbs === 0.0, lit(0.0)).otherwise(lit(127.0) / maxAbs)
  }

  /** Quantize to the int8 domain `[-127, 127]` with the given scale. */
  def quantize(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("int"))

  /** Exact integer dot product of two quantized vectors — the fused
    * native [[DotIntegral]] kernel (one tight long-accumulating loop, no
    * zipped intermediate; bit-identical to the compositional
    * `zip_with`+`aggregate` form it replaced). */
  def dotInt(a: Column, b: Column): Column =
    Bridge.column(DotIntegral(Bridge.expression(a), Bridge.expression(b)))

  /** Cosine over quantized vectors — integer dot/norms, one double
    * division at the end. Within ~1/127 of the exact cosine for unit-ish
    * vectors; pair with an exact re-rank of the survivors when that
    * matters. */
  def cosineQuantized(qa: Column, qb: Column): Column = {
    val denom = sqrt(dotInt(qa, qa).cast("double") * dotInt(qb, qb).cast("double"))
    when(denom === 0.0, lit(0.0))
      .otherwise(dotInt(qa, qb).cast("double") / denom)
  }

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

  // ---- portable (cross-engine) hyperplane LSH ------------------------------

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** First 8 hex chars of md5(key) as a (positive) long — the shared
    * pseudo-random scalar both engines can derive in closed form:
    * DuckDB spells it `CAST(('0x' || substr(md5(key), 1, 8)) AS BIGINT)`. */
  private def md5Int(key: String): Long =
    java.lang.Long.parseLong(md5Hex(key).substring(0, 8), 16)

  /** md5-derived INTEGER hyperplane components: component (p, i) =
    * `md5int(ns p ':' i) mod 9 - 4` ∈ [-4, 4]. Integer components (instead
    * of Gaussian floats) make the bucket bits exact integer arithmetic —
    * the sign decision can never flip between engines on a last-ulp float
    * difference, which is what makes the whole LSH blocking stage
    * hash-checkable against an independent SQL engine. Sign-LSH only needs
    * the plane directions to be spread; a 9-level discrete distribution is
    * as good a random direction source as a Gaussian for 64 dims. `ns`
    * namespaces independent plane tables (multi-table OR-amplification)
    * inside the same md5 scheme. */
  def portablePlanes(numPlanes: Int, dim: Int, ns: String = ""): Seq[Seq[Long]] =
    (0 until numPlanes).map(p => (0 until dim).map(i => md5Int(s"$ns$p:$i") % 9 - 4))

  /** Portable bucket: a `numPlanes`-char '0'/'1' bitstring where bit p =
    * `[ Σᵢ floor(vᵢ·1000)·c(p,i) > 0 ]`. The vector is quantized with
    * `floor(x·1000)` (float→double is exact and IEEE ×/floor are
    * deterministic, so both engines produce identical longs) and the dot
    * is pure integer math — bit-exact across engines by construction.
    * A bitstring (not a packed long) so external SQL needs no bit
    * builtins: Hamming distance is 8 char comparisons. One `transform`
    * over the plane index with the components as a nested array literal —
    * a per-plane `array(P × aggregate(…))` form would re-inline the
    * quantization per branch (CollapseProject duplicates HOF forms). */
  def portableBucketBits(vec: Column, planes: Seq[Seq[Long]]): Column = {
    val planesCol = array(planes.map(pl => array(pl.map(lit(_)): _*)): _*)
    concat_ws("", transform(sequence(lit(0), lit(planes.size - 1)), p =>
      when(aggregate(
          zip_with(vec, element_at(planesCol, p + 1),
            (x, c) => floor(x.cast("double") * lit(1000.0)).cast("long") * c),
          lit(0L), (acc, x) => acc + x) > 0, lit("1")).otherwise(lit("0"))))
  }

  /** Driver-side twin of [[portableBucketBits]] for a literal query vector
    * (same integer algebra, so a driver-computed probe key matches the
    * executor-computed bucket column exactly). */
  def portableBucketBitsLocal(vec: Seq[Float], planes: Seq[Seq[Long]]): String =
    planes.map { pl =>
      val dot = vec.zip(pl).map { case (x, c) =>
        math.floor(x.toDouble * 1000.0).toLong * c
      }.sum
      if (dot > 0) "1" else "0"
    }.mkString

  /** md5-derived fixed centroids for the IVF assignment oracle: center
    * (j, i) = `(md5int(ns ':' j ':' i) mod M - (M-1)/2) / 1000.0`, i.e.
    * components uniform in ±(M-1)/2000 (default `ns = "ivf"`, M = 2001 →
    * [-1, 1]). The division by 1000.0 is a single IEEE operation, so
    * both engines hold bit-identical doubles. `mod` exists because
    * centroid DISPERSION must roughly match the data's for argmin codes
    * to discriminate (the IVF-PQ oracle uses a ±0.25 coarse namespace
    * over the ±0.45 test embeddings — entries far outside the data range
    * make one entry win every argmin and the oracle degenerate). */
  def portableCentroids(numCells: Int, dim: Int, ns: String = "ivf",
      mod: Int = 2001): Array[Array[Double]] =
    Array.tabulate(numCells, dim)((j, i) =>
      (md5Int(s"$ns:$j:$i") % mod - (mod - 1) / 2) / 1000.0)

  /** Random-projection dimensionality reduction (Johnson–Lindenstrauss):
    * project onto `planes.size` directions — one `transform` over the
    * plane index, each output component a fused dot (same narrow codegen'd
    * map shape as [[portableBucketBits]], no shuffle). At 100 TB this is
    * the pre-ANN shrink step: 64→16 dims cuts every downstream index,
    * shuffle, and scoring pass 4× while JL keeps relative distances
    * within (1±ε). No 1/√k scaling — downstream cosine is invariant to a
    * uniform scale, so the raw dots keep the arithmetic simplest. */
  def project(vec: Column, planes: Seq[Seq[Float]]): Column = {
    val planesCol = array(planes.map(pl =>
      array(pl.map(x => lit(x.toDouble)): _*)): _*)
    transform(sequence(lit(0), lit(planes.size - 1)), p =>
      aggregate(
        zip_with(vec, element_at(planesCol, p + 1),
          (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x))
  }

  /** Exact-INTEGER projection over [[portablePlanes]] components: the
    * vector quantizes with floor(x·1000) and each output component is a
    * pure integer dot — bit-exact across engines (the
    * [[portableBucketBits]] algebra, emitting the dot instead of its
    * sign), which makes the projection hash-checkable in closed-form SQL.
    * The Gaussian [[project]] stays the production path. */
  def projectInt(vec: Column, planes: Seq[Seq[Long]]): Column = {
    val planesCol = array(planes.map(pl => array(pl.map(lit(_)): _*)): _*)
    transform(sequence(lit(0), lit(planes.size - 1)), p =>
      aggregate(
        zip_with(vec, element_at(planesCol, p + 1),
          (x, c) => floor(x.cast("double") * lit(1000.0)).cast("long") * c),
        lit(0L), (acc, x) => acc + x))
  }

  /** md5-derived per-subspace PQ codebooks — the [[portableCentroids]]
    * recipe under a subspace-scoped namespace: codebook entry `(s, j, i)`
    * = `(md5int('pq:' s ':' j ':' i) mod 2001 - 1000) / 1000.0`. Fixed
    * and engine-reproducible, so the PQ encode + ADC pipeline can be
    * oracled end to end (the k-means-fitted codebooks stay the
    * production path). `ns` scopes the hash namespace so independent
    * codebook families (raw-vector PQ vs IVF-PQ residual PQ) never share
    * entries; `mod` scales entry dispersion (see [[portableCentroids]] —
    * the residual codebooks use ±0.125 to match residual spread). */
  def pqPortableCodebooks(m: Int, ksub: Int, subDim: Int,
      ns: String = "pq", mod: Int = 2001): Array[Array[Array[Double]]] =
    Array.tabulate(m, ksub, subDim)((s, j, i) =>
      (md5Int(s"$ns:$s:$j:$i") % mod - (mod - 1) / 2) / 1000.0)
}
