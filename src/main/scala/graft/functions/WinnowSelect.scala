package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing selection as a native Catalyst expression — the per-window
  * rightmost-min fold of [[graft.operators.Winnow]] compiled down to a
  * monotone-deque sliding minimum.
  *
  * Why native: the higher-order-function formulation
  * (`transform(windows, j -> aggregate(sequence(j, j+w-1), …))`)
  * evaluates interpreted and costs O(nG·w) lambda dispatches per
  * document — measured at ~1.6 ms per 300-char document, which turns a
  * 5k-doc bench table into an 8-second single query and would make a
  * 100 TB corpus selection CPU-bound on expression interpretation
  * rather than hashing. The deque kernel is O(nG) with no lambda
  * dispatch at all, and the expression stays inside whole-stage codegen
  * via a static-kernel call (the [[MinHashSignature]] precedent).
  *
  * Semantics are EXACTLY the HOF fold's (the DuckDB oracles pin them):
  * windows of `min(w, nG)` consecutive hashes, each selecting its
  * minimum with ties to the RIGHTMOST position; selections deduplicated
  * and ordered by position. The monotone deque reproduces the rightmost
  * tie rule by evicting back entries with value `>=` the incoming one.
  */
case class WinnowSelect(child: Expression, w: Int)
    extends UnaryExpression {

  // w=0 or negative would make the deque kernel read uninitialized
  // slots; fail at construction with a clear message instead
  require(w >= 1, s"winnow_select window w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull must be false: the kernel's toLongArray() has no
    // null-element semantics (the producer, KgramHashes, emits
    // containsNull=false)
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_select requires array<bigint> with non-null elements, " +
        s"got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_select"

  override protected def nullSafeEval(input: Any): Any =
    WinnowImpl.select(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowImpl.select($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  /** Column API: `winnow_select(hashes, w)`. */
  def select(hashes: Column, w: Int): Column =
    Bridge.column(WinnowSelect(Bridge.expression(hashes), w))
}

object WinnowImpl {

  /** Kernel for [[KgramHashes]]: code-point start offsets over the
    * UTF-8 bytes (Spark `substring` character semantics), then each
    * k-gram byte window hashed in place. */
  def kgramHashes(s: UTF8String, k: Int, md5Mode: Boolean): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // code-point starts: every byte that is not a UTF-8 continuation
    val starts = new Array[Int](n + 1)
    var nChars = 0
    var i = 0
    while (i < n) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(nChars) = i; nChars += 1 }
      i += 1
    }
    starts(nChars) = n // sentinel: end offset of the final character
    if (nChars < k) return new GenericArrayData(Array.empty[Long])
    val digest =
      if (md5Mode) java.security.MessageDigest.getInstance("MD5") else null
    new GenericArrayData(
      KgramHashes.hash(bytes, starts, nChars, k, md5Mode, digest))
  }

  /** O(n) sliding rightmost-min selection. Deque invariant: positions
    * ascending, values STRICTLY ascending front→back (equal values are
    * evicted by later positions — that is precisely the rightmost tie
    * rule). The selected position is non-decreasing as windows advance,
    * so emit-on-change produces the distinct selection set already
    * ordered by position. */
  def select(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val h = hashes.toLongArray()
    val width = math.min(w, n)
    val dqPos = new Array[Int](n)
    var head = 0
    var tail = 0 // deque slice [head, tail)
    val out = new java.util.ArrayList[InternalRow](2 * n / (w + 1) + 2)
    var lastSel = -1
    var i = 0
    while (i < n) {
      while (tail > head && h(dqPos(tail - 1)) >= h(i)) tail -= 1
      dqPos(tail) = i
      tail += 1
      if (i >= width - 1) { // window [i-width+1, i] is complete
        while (dqPos(head) < i - width + 1) head += 1
        val sel = dqPos(head)
        if (sel != lastSel) {
          out.add(new GenericInternalRow(
            Array[Any](sel, h(sel))))
          lastSel = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
