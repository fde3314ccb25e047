package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.TableStore
import graft.sources.Stage

/** The pipeline is dimension-generic: a product dimension with a different
  * schema, key, and tracked column runs the same five-task cycle. */
class GenericDimensionSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val productConfig = ScdConfig(
    prefix = "product",
    baseSchema = StructType(Seq(
      StructField("product_id", LongType),
      StructField("sku", StringType),
      StructField("title", StringType),
      StructField("price_band", StringType))),
    businessKeys = Seq("sku"),
    trackedCols = Seq("price_band"))

  test("product dimension SCD2 cycle with its own tables") {
    val store = new TableStore(tmpDir("prod-store"), spark)
    val stage = new Stage(tmpDir("prod-stage"))
    val pipeline = new ScdPipeline(spark, store, faithful = true, productConfig)

    stage.putContent("p1.csv", "1,SKU-1,Widget,LOW\n2,SKU-2,Gadget,MID")
    pipeline.runCycle(stage, Timestamp.valueOf("2024-01-01 00:00:00")) shouldBe 2

    stage.putContent("p2.csv", "1,SKU-1,Widget,HIGH\n3,SKU-3,Gizmo,LOW")
    pipeline.runCycle(stage, Timestamp.valueOf("2024-02-01 00:00:00")) shouldBe 2

    val staging = pipeline.staging.orderBy("product_id", "start_date").collect()
    staging.length shouldBe 4 // 2 initial + SKU-1 new version + SKU-3 insert
    val sku1 = staging.filter(_.getAs[String]("sku") == "SKU-1")
    sku1.map(r => (r.getAs[String]("price_band"), r.getAs[String]("current_flag")))
      .toSeq shouldBe Seq(("LOW", "N"), ("HIGH", "Y"))

    pipeline.master.count() shouldBe 3
    // supplier tables untouched — namespaced per dimension
    store.exists("supplier_staging") shouldBe false
    store.exists("product_staging") shouldBe true
  }

  test("duplicate keys in one batch: Error policy raises, KeepOne dedupes") {
    val dupCsv = "1,SKU-1,Widget,LOW\n2,SKU-1,Widget,HIGH\n3,SKU-2,Gadget,MID"
    val t1 = Timestamp.valueOf("2024-01-01 00:00:00")

    // default (Snowflake-faithful): nondeterministic MERGE is an error
    val store1 = new TableStore(tmpDir("dup-err"), spark)
    val stage1 = new Stage(tmpDir("dup-err-stage"))
    stage1.putContent("b.csv", dupCsv)
    val err = intercept[IllegalArgumentException] {
      new ScdPipeline(spark, store1, faithful = true, productConfig)
        .runCycle(stage1, t1)
    }
    err.getMessage should include("duplicate business keys")

    // KeepOne: deterministic representative, invariants hold
    val store2 = new TableStore(tmpDir("dup-keep"), spark)
    val stage2 = new Stage(tmpDir("dup-keep-stage"))
    stage2.putContent("b.csv", dupCsv)
    val p = new ScdPipeline(spark, store2, faithful = true,
      productConfig.copy(duplicatePolicy = DuplicatePolicy.KeepOne))
    p.runCycle(stage2, t1)
    p.landing.count() shouldBe 2
    p.landing.filter("sku = 'SKU-1'").count() shouldBe 1
    p.streamChanges().count() shouldBe 0
  }

  test("corrected-mode pipeline reopens a returning tracked value") {
    val store = new TableStore(tmpDir("corr-store"), spark)
    val stage = new Stage(tmpDir("corr-stage"))
    val pipeline = new ScdPipeline(spark, store, faithful = false, productConfig)

    val t = (i: Int) => Timestamp.valueOf(f"2024-0$i-01 00:00:00")
    stage.putContent("b1.csv", "1,SKU-1,Widget,LOW")
    pipeline.runCycle(stage, t(1))
    stage.putContent("b2.csv", "1,SKU-1,Widget,HIGH")
    pipeline.runCycle(stage, t(2))
    stage.putContent("b3.csv", "1,SKU-1,Widget,LOW") // return to prior value
    pipeline.runCycle(stage, t(3))

    val hist = pipeline.staging.orderBy("start_date").collect()
      .map(r => (r.getAs[String]("price_band"), r.getAs[String]("current_flag")))
    // corrected mode: three versions, LOW reopened (faithful mode would
    // swallow the return — SURVEY.md §4b.1)
    hist.toSeq shouldBe Seq(("LOW", "N"), ("HIGH", "N"), ("LOW", "Y"))
  }
}
