package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class PercentilesSpec extends AnyFunSuite with Matchers with SparkSpec {

  import org.apache.spark.sql.functions._

  test("sort-based percentiles match hand-computed interpolation") {
    val s = spark
    import s.implicits._
    // group a: 1..4 → p50 = 2.5 (interpolated), p100 = 4
    // group b: 10 → every percentile = 10
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 10.0))
      .toDF("g", "v")
    val out = Percentiles.exactByGroup(df, Seq("g"), "v", Seq(0.5, 1.0))
      .orderBy("g").collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("a", "b")
    out(0).getDouble(1) shouldBe 2.5 +- 1e-9
    out(0).getDouble(2) shouldBe 4.0 +- 1e-9
    out(1).getDouble(1) shouldBe 10.0 +- 1e-9
    out(1).getDouble(2) shouldBe 10.0 +- 1e-9
  }

  test("sort-based percentiles equal the built-in percentile() on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000)
      .map(i => (s"g${i % 7}", rnd.nextDouble() * 1000))
      .toDF("g", "v")
    val ps = Seq(0.1, 0.5, 0.9, 0.99)

    val sorted = Percentiles.exactByGroup(df, Seq("g"), "v", ps)
      .orderBy("g").collect()
    val builtin = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("p"))
      .orderBy("g").collect()

    sorted.length shouldBe builtin.length
    sorted.zip(builtin).foreach { case (a, b) =>
      a.getString(0) shouldBe b.getString(0)
      val exp = b.getSeq[Double](1)
      ps.indices.foreach { i =>
        a.getDouble(1 + i) shouldBe exp(i) +- 1e-6
      }
    }
  }

  test("nulls are ignored; single-row and two-row groups interpolate correctly") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", Some(5.0)))
      .toDF("g", "v")
    val out = Percentiles.exactByGroup(df, Seq("g"), "v", Seq(0.5))
      .orderBy("g").collect()
    out(0).getDouble(1) shouldBe 2.0 +- 1e-9 // nulls excluded: {1,3} → 2
    out(1).getDouble(1) shouldBe 5.0 +- 1e-9
  }

  test("range-parallel sorted percentiles equal the window form and the built-in") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    // few huge groups — the shape exactByGroupSorted targets — plus ties
    val df = (1 to 8000)
      .map(i => (s"g${i % 3}", (rnd.nextInt(500) / 7.0)))
      .toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val a = Percentiles.exactByGroupSorted(df, Seq("g"), "v", ps, Some(16))
      .orderBy("g").collect()
    val b = Percentiles.exactByGroup(df, Seq("g"), "v", ps)
      .orderBy("g").collect()
    val c = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("p"))
      .orderBy("g").collect()
    a.length shouldBe 3
    a.zip(b).zip(c).foreach { case ((ra, rb), rc) =>
      ra.getString(0) shouldBe rb.getString(0)
      val exp = rc.getSeq[Double](1)
      ps.indices.foreach { i =>
        ra.getDouble(1 + i) shouldBe exp(i) +- 1e-6
        rb.getDouble(1 + i) shouldBe exp(i) +- 1e-6
      }
    }
  }

  test("exactByGroupSorted falls back to the window form above the group-cardinality guard") {
    val s = spark
    import s.implicits._
    // 100k single-row groups: pass 1 of the range-sorted form would ship
    // partitions × 100k count-tuples to the driver — exactly the shape the
    // guard must reroute. Correctness: a single-row group's percentile is
    // its value.
    val n = 100000
    val df = spark.range(n)
      .select(col("id").as("g"), (col("id") % 97).cast("double").as("v"))
    val out = Percentiles.exactByGroupSorted(df, Seq("g"), "v", Seq(0.5))
    // the sorted path ends in an eager localCheckpoint (LogicalRDD); the
    // window fallback stays a declarative plan — observable proof the
    // guard rerouted rather than collected
    out.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    } shouldBe empty
    out.count() shouldBe n
    out.filter(col("g") === 12345).head().getDouble(1) shouldBe (12345 % 97).toDouble +- 1e-9
    out.filter(col("g") === 99999).head().getDouble(1) shouldBe (99999 % 97).toDouble +- 1e-9

    // and a low-cardinality input still takes the range-sorted path
    val few = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("g", "v")
    Percentiles.exactByGroupSorted(few, Seq("g"), "v", Seq(0.5))
      .queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l
      } should not be empty
  }

  test("approx_count_distinct stays within 5% of exact (the 100 TB distinct path)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 20000).map(_ => rnd.nextInt(3000)).toDF("k")
    val exact = df.select(countDistinct($"k")).head().getLong(0)
    val approx = df.select(approx_count_distinct($"k")).head().getLong(0)
    math.abs(approx - exact).toDouble / exact should be < 0.05
  }

  test("percentile column names derive from the fraction") {
    Percentiles.colName(0.5) shouldBe "p50"
    Percentiles.colName(0.9) shouldBe "p90"
    Percentiles.colName(0.999) shouldBe "p99_9"
    Percentiles.colName(1.0) shouldBe "p100"
  }
}
