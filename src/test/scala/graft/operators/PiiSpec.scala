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

  test("kAnonymizeGeneralize: settles at the minimal clean ladder state, " +
      "retains strictly more rows than suppression at equal k, and the " +
      "release re-audits clean by construction") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // zips 94110/94117 share the 9411x prefix; level 1 coarsens to the
    // 4-digit prefix (94117's lone pair merges into the 94110 trio),
    // level 2 collapses the zip entirely
    val df = Seq(
      (1L, "30-40", 94110L), (2L, "30-40", 94110L), (3L, "30-40", 94110L),
      (4L, "30-40", 94117L), (5L, "30-40", 94117L), // class of 2 at level 0
      (6L, "50-60", 94210L), (7L, "50-60", 94210L), (8L, "50-60", 94211L))
      .toDF("id", "age_band", "zip")
    val ladder = Seq(
      Seq(col("age_band"), expr("zip div 10")),
      Seq(col("age_band"), lit(0L)))
    val gen = Pii.kAnonymizeGeneralize(df, Seq("age_band", "zip"), ladder,
      k = 3)
    // level 1 is the minimal clean state: 9411x has 5, 9421x has 3
    gen.select("gen_level").distinct().collect()
      .map(_.getLong(0)).toList shouldBe List(1L)
    gen.count() shouldBe 8L // every row retained, coarsened
    gen.filter($"id" === 4L).head().getLong(2) shouldBe 9411L
    Pii.kAnonymityAudit(gen, Seq("age_band", "zip"), k = 3)
      .count() shouldBe 0L
    // the headline claim: at equal k, generalization retains strictly
    // more rows than suppression (which drops the sub-k classes)
    val suppressed = Pii.kAnonymizeSuppress(df, Seq("age_band", "zip"), k = 3)
    gen.count() should be > suppressed.count()

    // already-anonymous input releases at level 0, values untouched
    val clean = df.filter($"zip" === 94110L)
    val gen0 = Pii.kAnonymizeGeneralize(clean, Seq("age_band", "zip"),
      ladder, k = 3)
    gen0.select("gen_level").distinct().head().getLong(0) shouldBe 0L
    gen0.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
      .toList shouldBe List((1L, 94110L), (2L, 94110L), (3L, 94110L))

    // a ladder whose coarsest state still leaves sub-k classes:
    // residual suppression keeps the release k-anonymous, and the
    // no-suppression mode refuses loudly instead of leaking
    val shortLadder = Seq(Seq(col("age_band"), expr("zip div 10")))
    val twoRows = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 11L),
      (4L, "b", 99L)).toDF("id", "age_band", "zip")
    val resid = Pii.kAnonymizeGeneralize(twoRows, Seq("age_band", "zip"),
      shortLadder, k = 3)
    resid.select("id").collect().map(_.getLong(0)).sorted.toList shouldBe
      List(1L, 2L, 3L) // the 'b' singleton is suppressed at the top state
    Pii.kAnonymityAudit(resid, Seq("age_band", "zip"), k = 3)
      .count() shouldBe 0L
    an[IllegalStateException] should be thrownBy
      Pii.kAnonymizeGeneralize(twoRows, Seq("age_band", "zip"), shortLadder,
        k = 3, suppressResidual = false).collect()

    // a ladder state that changes a quasi column's type refuses up front
    an[IllegalArgumentException] should be thrownBy
      Pii.kAnonymizeGeneralize(df, Seq("age_band", "zip"),
        Seq(Seq(col("age_band"), lit("*"))), k = 3)
  }
}
