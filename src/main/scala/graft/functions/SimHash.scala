package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over a token array — a native Catalyst expression so it
  * stays inside whole-stage codegen (the hot path of a 100 TB dedup scan),
  * rather than a Scala UDF that would box every row.
  *
  * Algorithm (Charikar 2002, as used in web-scale near-dup detection): hash
  * every token with xxhash64; for each of the 64 bit positions accumulate
  * +1/-1 by whether the token hash has that bit set; the output bit is the
  * sign. Near-duplicate documents differ in a few bits, so
  * `bit_count(a ^ b) <= k` (Hamming distance) finds them — see
  * [[graft.operators.Dedup.simHashDuplicates]].
  *
  * The kernel lives in [[SimHashImpl.compute]] (plain static JVM code) and
  * `doGenCode` emits a call to it, so generated code stays a one-liner and
  * the expression composes with codegen'd neighbors.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashImpl {
  final val Seed = 42L

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val weights = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) weights(b) += 1 else weights(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (weights(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object SimHash {
  /** Column API: `simhash64(tokens)` over an `array<string>` column. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** Register `simhash64` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
}
