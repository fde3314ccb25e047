package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Pins the Column ↔ Catalyst Expression bridge against Spark-internal
  * layout changes: `Bridge` reaches `private[sql] ExpressionUtils` from an
  * `org.apache.spark.sql` sub-package (the standard extension-library
  * access pattern), which is deliberate but version-coupled — a Spark
  * upgrade that moves those internals must fail HERE, loudly, not at some
  * distant call site of the native expressions built on it. */
class BridgeSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("Column → Expression → Column round-trip evaluates unchanged") {
    val c = col("id") * 2 + 1
    val roundTripped = Bridge.column(Bridge.expression(c))
    val got = spark.range(5).select(roundTripped.as("y"))
      .collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(1L, 3L, 5L, 7L, 9L)
  }

  test("expressions built from bridged children evaluate like the library's native kernels") {
    // the exact construction pattern of the native expressions
    // (CosineSimFloat, NearestCenter, …): take Bridge.expression of the
    // caller's Columns as children, wrap in a Catalyst expression, return
    // via Bridge.column — a bridge handing back wrapped/aliased nodes
    // would break child resolution in this path
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1f, 0f), Seq(1f, 0f)), (Seq(1f, 0f), Seq(0f, 1f)))
      .toDF("a", "b")
    val cos = graft.functions.VectorFunctions.cosineFused(col("a"), col("b"))
    df.select(cos).collect().map(_.getDouble(0)).toSeq shouldBe Seq(1.0, 0.0)
  }
}
