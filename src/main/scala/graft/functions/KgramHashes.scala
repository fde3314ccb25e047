package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character k-gram hashes of a string as one native kernel — the
  * hashing stage of [[graft.operators.Winnow]] without the per-gram
  * Catalyst dispatches.
  *
  * The compositional form (`transform(sequence(…), i -> substr)` then
  * `transform(grams, g -> hash)`) allocates a UTF8String per gram and
  * pays two interpreted lambda dispatches per gram — ~600 dispatches
  * per 300-char document, the remaining hot spot after the selection
  * fold went native. This kernel walks the UTF-8 bytes once, records
  * code-point start offsets (the same character semantics as Spark's
  * `substring`/`length`), and hashes each byte window in place.
  *
  * `md5` mode reproduces `conv(substring(md5(g), 1, 12), 16, 10)`
  * exactly — the first 48 bits of the digest read big-endian — so the
  * DuckDB closed forms keep hash-matching. `xxhash64` mode reproduces
  * Spark's `xxhash64(g)` (XXH64 over the gram's UTF-8 bytes, seed 42).
  * Strings shorter than `k` characters yield the empty array, matching
  * the compositional guard. */
case class KgramHashes(child: Expression, k: Int, mode: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_hashes requires string, got ${other.catalogString}")
  }
  override def dataType: DataType =
    ArrayType(DataTypes.LongType, containsNull = false)
  override def prettyName: String = "kgram_hashes"

  private val md5Mode = mode match {
    case "md5" => true
    case "xxhash64" => false
    case other => throw new IllegalArgumentException(
      s"mode must be md5 or xxhash64, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowImpl.kgramHashes(input.asInstanceOf[UTF8String], k, md5Mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowImpl.kgramHashes($c, $k, $md5Mode)")

  override protected def withNewChildInternal(newChild: Expression): KgramHashes =
    copy(child = newChild)
}

object KgramHashes {
  /** Column API: `kgram_hashes(norm, k, mode)`. */
  def apply(norm: Column, k: Int, mode: String): Column =
    Bridge.column(KgramHashes(Bridge.expression(norm), k, mode))

  /** Kernel body, shared with [[WinnowImpl]]. */
  private[functions] def hash(bytes: Array[Byte], starts: Array[Int],
      nChars: Int, k: Int, md5Mode: Boolean,
      digest: java.security.MessageDigest): Array[Long] = {
    val nGrams = nChars - k + 1
    val out = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val from = starts(i)
      val until = starts(i + k)
      if (md5Mode) {
        digest.reset()
        digest.update(bytes, from, until - from)
        val d = digest.digest()
        out(i) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
          ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
          ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      } else {
        out(i) = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
          until - from, 42L)
      }
      i += 1
    }
    out
  }
}
