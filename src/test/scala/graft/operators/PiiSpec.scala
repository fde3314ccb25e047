package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class PiiSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("kAnonymityAudit reports exactly the sub-k classes; suppression " +
      "drops their rows and the release re-audits clean") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "30-40", 94110L), (2L, "30-40", 94110L), (3L, "30-40", 94110L),
      (4L, "30-40", 94117L), (5L, "30-40", 94117L), // class of 2 — violates
      (6L, "50-60", 94110L)) // class of 1 — violates
      .toDF("id", "age_band", "zip")

    val audit = Pii.kAnonymityAudit(df, Seq("age_band", "zip"), k = 3)
      .orderBy("age_band", "zip").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    audit shouldBe List(("30-40", 94117L, 2L), ("50-60", 94110L, 1L))

    val kept = Pii.kAnonymizeSuppress(df, Seq("age_band", "zip"), k = 3)
    kept.select("id").collect().map(_.getLong(0)).sorted.toList shouldBe
      List(1L, 2L, 3L)
    // the released relation is k-anonymous by construction
    Pii.kAnonymityAudit(kept, Seq("age_band", "zip"), k = 3)
      .count() shouldBe 0L

    // a fully-anonymous relation audits empty and suppresses nothing
    Pii.kAnonymityAudit(df.filter($"zip" === 94110L && $"age_band" === "30-40"),
      Seq("age_band", "zip"), k = 3).count() shouldBe 0L

    an[IllegalArgumentException] should be thrownBy
      Pii.kAnonymityAudit(df, Seq("age_band"), k = 1)
    an[IllegalArgumentException] should be thrownBy
      Pii.kAnonymityAudit(df, Seq.empty, k = 3)
  }

  test("k-anonymity treats NULL quasi values as a class: audited, " +
      "suppressed, and the release still re-audits clean") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, String, java.lang.Long)](
      (1L, "30-40", 94110L), (2L, "30-40", 94110L), (3L, "30-40", 94110L),
      (4L, "30-40", null)) // a lone NULL-zip class — violates k=3
      .toDF("id", "age_band", "zip")
    val audit = Pii.kAnonymityAudit(df, Seq("age_band", "zip"), k = 3)
    audit.count() shouldBe 1L
    audit.head().isNullAt(1) shouldBe true
    val kept = Pii.kAnonymizeSuppress(df, Seq("age_band", "zip"), k = 3)
    kept.select("id").collect().map(_.getLong(0)).sorted.toList shouldBe
      List(1L, 2L, 3L)
    Pii.kAnonymityAudit(kept, Seq("age_band", "zip"), k = 3)
      .count() shouldBe 0L
  }
}
