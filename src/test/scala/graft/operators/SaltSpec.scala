package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Salted join / aggregation must be result-identical to the unsalted
  * forms (salting only changes the partitioning). */
class SaltSpec extends AnyFunSuite with Matchers with SparkSpec {

  import org.apache.spark.sql.functions._

  test("saltedJoin equals plain join on a skewed key") {
    val s = spark
    import s.implicits._
    // 90% of facts share one hot key
    val fact = (1 to 1000)
      .map(i => (if (i <= 900) 1L else i.toLong % 10, s"payload$i"))
      .toDF("k", "payload")
    val dim = (0L to 10L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = fact.join(dim, Seq("k")).select("k", "payload", "attr")
      .collect().map(_.toString).sorted
    val salted = Salt.saltedJoin(fact, dim, Seq("k"), saltFactor = 4)
      .select("k", "payload", "attr")
      .collect().map(_.toString).sorted
    salted shouldBe plain
  }

  test("saltedSumCount equals plain aggregation") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i => (i % 3L, i.toDouble)).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val salted = Salt.saltedSumCount(df, Seq("k"), "v", saltFactor = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    salted shouldBe plain
  }

  test("salt column is deterministic and bounded") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"x$i")).toDF("id", "t")
    val salts = df.select(Salt.saltColumn(8, $"id", $"t").as("s"))
      .collect().map(_.getInt(0))
    salts.forall(x => x >= 0 && x < 8) shouldBe true
    val again = df.select(Salt.saltColumn(8, $"id", $"t").as("s"))
      .collect().map(_.getInt(0))
    again.toSeq shouldBe salts.toSeq
  }
}
