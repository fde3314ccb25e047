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

  test("JSONL COPY: explicit schema, malformed lines quarantined, gz auto-detected") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val stage = new Stage(tmpDir("jsonl"))
    stage.putContent("a.jsonl",
      """{"doc_id":1,"text":"hello","lang":"en"}
        |{"doc_id":2,"text":"welt","lang":"de"}
        |{not json at all
        |{"doc_id":3,"text":"ok"}""".stripMargin)
    // cache before filtering on the corrupt column: Spark disallows raw
    // file queries that reference ONLY the internal corrupt-record column
    val out = stage.readJsonl(spark, schema).cache()
    try {
      out.count() shouldBe 4
      val clean = out.filter(col(Stage.CorruptCol).isNull)
      val quarantine = out.filter(col(Stage.CorruptCol).isNotNull)
      clean.count() shouldBe 3 // missing field -> null, still clean
      quarantine.count() shouldBe 1
      quarantine.select(Stage.CorruptCol).head().getString(0) should
        startWith("{not json")
      clean.filter(col("doc_id") === 3).select("lang").head()
        .isNullAt(0) shouldBe true
    } finally out.unpersist()

    // compression auto-detected from the extension, same as the CSV path
    val gz = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.GZIPOutputStream(gz)
    z.write("""{"doc_id":9,"text":"zipped","lang":"en"}""".getBytes("UTF-8"))
    z.close()
    val gzStage = new Stage(tmpDir("jsonl-gz"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(gzStage.dir, "b.jsonl.gz"), gz.toByteArray)
    val zipped = gzStage.readJsonl(spark, schema)
    zipped.count() shouldBe 1
    zipped.select("text").head().getString(0) shouldBe "zipped"

    // empty stage -> typed empty frame with the quarantine column
    val empty = new Stage(tmpDir("jsonl-empty")).readJsonl(spark, schema)
    empty.count() shouldBe 0
    empty.columns should contain(Stage.CorruptCol)
  }
}
