package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass MinHash signature over a shingle array — a native Catalyst
  * expression because the compositional formulation
  * (`array(k × array_min(transform(hashes, …)))`) gets its shared
  * subexpression inlined by Catalyst into every branch: the string hashing
  * runs k× per shingle instead of once (measured 35× slower at k=64).
  *
  * Kernel: each shingle is xxhash64'd ONCE; the k "permutations" are a
  * multiply-add universal-hash family `h_i(x) = a_i·x + b_i` over that long
  * (plain JVM arithmetic — wrapping is intended and invisible to Spark's
  * ANSI checks); sig[i] = min_i. O(shingles × k) with k cheap mixes, one
  * expensive hash.
  *
  * Stays inside whole-stage codegen via a static-kernel call, like
  * [[SimHash64]].
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashImpl.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** MinHash signature computed straight from the TOKEN array: shingle
  * construction is fused into the kernel (each token xxhash64'd once, each
  * n-token window combined with a wrapping polynomial mix) so no shingle
  * strings are ever materialized. The compositional
  * `transform(sequence, slice+concat_ws)` shingling costs ~13µs/shingle in
  * generated code (array copy + string build per window) and dominated the
  * whole dedup pipeline; this kernel reduces the scan to split + O(tokens)
  * arithmetic.
  */
case class MinHashTokens(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_tokens requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_tokens"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.computeFromTokens(
      input.asInstanceOf[ArrayData], shingleSize, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashImpl.computeFromTokens($c, $shingleSize, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashTokens =
    copy(child = newChild)
}

/** The n-gram shingle set as 64-bit hashes (same fused window-combine as
  * [[MinHashTokens]], without the min-reduction): the exact-Jaccard verify
  * step runs on `array<long>` instead of materialized shingle strings —
  * identical set semantics up to 64-bit collisions (~|sh|²/2⁶⁴, negligible),
  * at a fraction of the compute and shuffle width. */
case class ShingleHashes(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.shingleHashes(input.asInstanceOf[ArrayData], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashImpl.shingleHashes($c, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** The hashed shingle SET, sorted and deduplicated — the verify-side
  * representation: Jaccard over two of these is a linear merge
  * ([[JaccardSorted]]) instead of a per-pair hash-set build, and the
  * MinHash signature is unaffected (a min-reduction ignores order and
  * duplicates), so one sorted array serves both banding and verification.
  * Sorting costs O(w log w) ONCE per document; the candidate-pair verify
  * stage compares each document against many partners, so the per-pair
  * saving dominates. Use [[ShingleHashes]] where window ORDER matters
  * (e.g. [[TextFunctions.rollingFingerprint]]). */
case class ShingleHashesSorted(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_sorted requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_sorted"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.shingleHashesSorted(input.asInstanceOf[ArrayData], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashImpl.shingleHashesSorted($c, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesSorted =
    copy(child = newChild)
}

/** Exact Jaccard over two SORTED-DISTINCT long arrays (the
  * [[ShingleHashesSorted]] output): one linear merge per pair, no per-pair
  * allocation. Equals `|a ∩ b| / |a ∪ b|` with distinct-set semantics
  * (0.0 when both are empty) — the same value
  * [[TextFunctions.jaccard]] computes via array_intersect/array_union,
  * at a fraction of the cost in the quadratic verify stage. */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaccard_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHashImpl.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MinHashImpl.jaccardSorted($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardSorted = copy(left = newLeft, right = newRight)
}

/** Exact Jaccard over two SORTED-DISTINCT string arrays (binary UTF8
  * order, i.e. the output of `array_sort(array_distinct(...))`): linear
  * merge with bytewise compares — the string-exact counterpart of
  * [[JaccardSorted]] for baselines that must stay on shingle STRINGS
  * (no hashing) yet not pay a per-pair hash-set build. Arrays must not
  * contain nulls. */
case class JaccardSortedStrings(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted_str requires two array<string>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaccard_sorted_str"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHashImpl.jaccardSortedStr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MinHashImpl.jaccardSortedStr($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardSortedStrings =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature derived from an ALREADY-HASHED shingle array
  * (`array<long>`, the output of [[ShingleHashes]]): only the k cheap
  * multiply-add mixes run — no string hashing at all. Lets callers persist
  * the hashed-shingle projection once and derive both the banding
  * signature and the exact-verify sets from it: exactly one pass of
  * string hashing per document, however many downstream uses.
  * `signatureFromHashes(shingleHashes(toks)) == signatureFromTokens(toks)`
  * by construction (same window-hash values feed the same min-reduction).
  */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_from_hashes requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.computeFromHashes(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashImpl.computeFromHashes($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

object MinHashImpl {
  final val Seed = 42L
  final val MaxHashes = 256

  // fixed seeded multiply-add family; a_i odd so the map is a bijection
  private val (as, bs) = {
    val rnd = new java.util.Random(Seed)
    (Array.fill(MaxHashes)(rnd.nextLong() | 1L), Array.fill(MaxHashes)(rnd.nextLong()))
  }

  /** Fused kernel: token hashes once, window-combined with a wrapping
    * polynomial (order-sensitive, like a string shingle), then k mins.
    * Fewer than `shingleSize` tokens collapse to one whole-array window
    * (mirroring [[TextFunctions.wordShingles]]). */
  def computeFromTokens(tokens: ArrayData, shingleSize: Int, numHashes: Int): ArrayData = {
    require(numHashes <= MaxHashes, s"numHashes > $MaxHashes")
    val th = tokenHashes(tokens)
    val n = th.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val windows = if (n < shingleSize) 1 else n - shingleSize + 1
    val width = math.min(shingleSize, n)
    var w = 0
    while (w < windows) {
      val h = windowHash(th, w, width)
      var k = 0
      while (k < numHashes) {
        val m = as(k) * h + bs(k)
        if (m < mins(k)) mins(k) = m
        k += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  private def tokenHashes(tokens: ArrayData): Array[Long] = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val s = tokens.getUTF8String(j)
        th(j) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
      }
      j += 1
    }
    th
  }

  private def windowHash(th: Array[Long], start: Int, width: Int): Long = {
    var h = -7046029254386353131L // xxh64 prime seed
    var i = 0
    while (i < width) {
      h = h * -4417276706812531889L ^ th(start + i) // wrapping poly combine
      i += 1
    }
    h
  }

  /** Kernel for [[ShingleHashes]]: all window hashes. */
  def shingleHashes(tokens: ArrayData, shingleSize: Int): ArrayData = {
    val th = tokenHashes(tokens)
    val n = th.length
    val windows = if (n < shingleSize) 1 else n - shingleSize + 1
    val width = math.min(shingleSize, n)
    val out = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      out(w) = windowHash(th, w, width)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Kernel for [[ShingleHashesSorted]]: window hashes, sorted, deduped. */
  def shingleHashesSorted(tokens: ArrayData, shingleSize: Int): ArrayData = {
    val h = shingleHashes(tokens, shingleSize).toLongArray()
    java.util.Arrays.sort(h)
    var n = 0
    var i = 0
    while (i < h.length) {
      if (i == 0 || h(i) != h(i - 1)) { h(n) = h(i); n += 1 }
      i += 1
    }
    new GenericArrayData(if (n == h.length) h else java.util.Arrays.copyOf(h, n))
  }

  /** Kernel for [[JaccardSorted]]: linear merge of two sorted-distinct
    * arrays. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Kernel for [[JaccardSortedStrings]]: linear merge of two
    * sorted-distinct UTF8String arrays. */
  def jaccardSortedStr(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Kernel for [[MinHashFromHashes]]: min-reduce the k universal-hash
    * mixes over pre-hashed shingles. */
  def computeFromHashes(hashes: ArrayData, numHashes: Int): ArrayData = {
    require(numHashes <= MaxHashes, s"numHashes > $MaxHashes")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var k = 0
      while (k < numHashes) {
        val m = as(k) * h + bs(k)
        if (m < mins(k)) mins(k) = m
        k += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    require(numHashes <= MaxHashes, s"numHashes > $MaxHashes")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val s = shingles.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        var i = 0
        while (i < numHashes) {
          val m = as(i) * h + bs(i)
          if (m < mins(i)) mins(i) = m
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHash {
  /** Column API: `minhash_signature(shingles, k)`. */
  def signature(shingles: Column, numHashes: Int = 64): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))

  /** Fused shingle+signature from a token array (the fast path — see
    * [[MinHashTokens]]). */
  def signatureFromTokens(tokens: Column, shingleSize: Int = 3,
      numHashes: Int = 64): Column =
    Bridge.column(MinHashTokens(Bridge.expression(tokens), shingleSize, numHashes))

  /** All window hashes (the hashed shingle set — see [[ShingleHashes]]). */
  def shingleHashes(tokens: Column, shingleSize: Int = 3): Column =
    Bridge.column(ShingleHashes(Bridge.expression(tokens), shingleSize))

  /** Signature from a pre-hashed shingle array (see [[MinHashFromHashes]]). */
  def signatureFromHashes(hashes: Column, numHashes: Int = 64): Column =
    Bridge.column(MinHashFromHashes(Bridge.expression(hashes), numHashes))

  /** Sorted-distinct hashed shingle set (see [[ShingleHashesSorted]]). */
  def shingleHashesSorted(tokens: Column, shingleSize: Int = 3): Column =
    Bridge.column(ShingleHashesSorted(Bridge.expression(tokens), shingleSize))

  /** Merge-based Jaccard over two sorted-distinct arrays
    * (see [[JaccardSorted]]). */
  def jaccardSorted(a: Column, b: Column): Column =
    Bridge.column(JaccardSorted(Bridge.expression(a), Bridge.expression(b)))

  /** Merge-based Jaccard over two sorted-distinct STRING arrays
    * (see [[JaccardSortedStrings]]). */
  def jaccardSortedStr(a: Column, b: Column): Column =
    Bridge.column(JaccardSortedStrings(Bridge.expression(a), Bridge.expression(b)))

  /** Register for SQL: `minhash_signature(arr)` with k=64. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", exprs => MinHashSignature(exprs.head, 64), "scala_udf")
}
