package graft.sources

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.{Schemas, TableStore}
import graft.pipeline.ScdPipeline

/** The reference CSV dialect (`SCD-Configuration Setup.sql:66-71`):
  * comma-delimited, no header, fields optionally enclosed by `'`. */
class StageSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("single-quote enclosed fields may contain the delimiter") {
    val stage = new Stage(tmpDir("dialect"))
    stage.putContent("s.csv",
      "1,A101,'Kohli, Virat',Delhi\n2,A102,Dhoni,'Ranchi'")
    val rows = stage.readCsv(spark, Schemas.raw)
      .orderBy("supplier_key").collect()
    rows(0).getAs[String]("supplier_name") shouldBe "Kohli, Virat"
    rows(0).getAs[String]("supplier_state") shouldBe "Delhi"
    rows(1).getAs[String]("supplier_state") shouldBe "Ranchi" // quotes stripped
  }

  test("empty fields load as NULL and never trigger updates (null-propagating !=)") {
    val store = new TableStore(tmpDir("null-store"), spark)
    val stage = new Stage(tmpDir("null-stage"))
    val pipeline = new ScdPipeline(spark, store)

    stage.putContent("b1.csv", "1,A101,Kohli,Delhi")
    pipeline.runCycle(stage, Timestamp.valueOf("2024-01-01 00:00:00"))

    // same row but with an empty (NULL) name: NULL != 'Kohli' is UNKNOWN,
    // state/key unchanged → no update, no CDC, no new version (§4b.4)
    stage.putContent("b2.csv", "1,A101,,Delhi")
    pipeline.runCycle(stage, Timestamp.valueOf("2024-01-02 00:00:00"))

    pipeline.landing.head().getAs[String]("supplier_name") shouldBe "Kohli"
    pipeline.staging.count() shouldBe 1
    pipeline.staging.head().getAs[String]("current_flag") shouldBe "Y"
  }

  test("LIST and RM mirror stage contents") {
    val stage = new Stage(tmpDir("listrm"))
    stage.putContent("a.csv", "x")
    stage.putContent("b.csv", "y")
    stage.list().map(f => f.substring(f.lastIndexOf('/') + 1)) shouldBe
      Seq("a.csv", "b.csv")
    stage.rm()
    stage.list() shouldBe empty
  }
}
