package graft.pipeline

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.TableStore
import graft.sources.Stage

/** Property tests (SURVEY.md §5.3): random batch sequences through the full
  * pipeline must preserve the SCD2 invariants, and the windowed-lead oracle
  * must reconstruct end dates independently (§5.4). Deterministic seeds (no
  * scalatestplus bridge in the offline cache, so generation is a plain
  * seeded Random rather than ScalaCheck's forAll driver). */
class ScdPropertySpec extends AnyFunSuite with Matchers with SparkSpec {

  private val codes = Vector("A101", "A102", "A103", "A104")
  private val states = Vector("Delhi", "Ranchi", "Gujarat")
  private val names = Vector("N1", "N2")

  private def randomBatch(rnd: scala.util.Random): Seq[String] =
    codes.zipWithIndex
      .filter(_ => rnd.nextBoolean())
      .map { case (c, i) =>
        s"${i + 1},$c,${names(rnd.nextInt(names.length))},${states(rnd.nextInt(states.length))}"
      }

  test("random batch sequences preserve SCD2 invariants") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val store = new TableStore(tmpDir("prop-store"), spark)
      val stage = new Stage(tmpDir("prop-stage"))
      // a registered MV rides along: its invariant (≡ full recompute of
      // landing) must hold after EVERY random cycle sequence
      val mv = MaterializedAggregate("by_state",
        keys = Seq("supplier_state"), measures = Seq("supplier_key"))
      val pipeline = new ScdPipeline(spark, store,
        config = ScdConfig.supplier.copy(aggregates = Seq(mv)))

      for (i <- 0 until 3) {
        val csv = randomBatch(rnd).mkString("\n")
        if (csv.nonEmpty) stage.putContent(s"batch$i.csv", csv)
        pipeline.runCycle(stage,
          Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"))
      }

      val staging = pipeline.staging.collect()

      // ≤ 1 current row per (code, state) — the faithful-mode match key
      val currents = staging.filter(_.getAs[String]("current_flag") == "Y")
      currents.groupBy(r => (r.getAs[String]("supplier_code"),
        r.getAs[String]("supplier_state")))
        .values.foreach(g => withClue(s"seed=$seed") { g.length shouldBe 1 })

      // closed ⟺ end_date set
      staging.foreach { r =>
        val closed = r.getAs[String]("current_flag") == "N"
        withClue(s"seed=$seed row=$r") {
          (r.getAs[Timestamp]("end_date") != null) shouldBe closed
        }
      }

      // master ≡ σ(flag='Y') projected
      val masterKeys = pipeline.master.collect()
        .map(r => (r.getAs[String]("supplier_code"), r.getAs[String]("supplier_state")))
        .toSet
      currents.map(r => (r.getAs[String]("supplier_code"),
        r.getAs[String]("supplier_state"))).toSet shouldBe masterKeys

      // stream fully consumed after every cycle
      pipeline.streamChanges().count() shouldBe 0L

      // maintained aggregate ≡ full recompute, whatever the random history
      withClue(s"seed=$seed MV") {
        pipeline.aggregate("by_state")
          .orderBy("supplier_state").collect().map(_.toSeq).toSeq shouldBe
          graft.ops.IncrementalAgg.fullAggregate(
              pipeline.landing, mv.keys, mv.measures)
            .orderBy("supplier_state").collect().map(_.toSeq).toSeq
      }

      // as-of join property: for any probe time, each (code, ts) fact
      // matches AT MOST one version (disjoint validity ranges), and
      // pointInTime picks exactly the row a brute driver-side scan picks
      {
        val s2 = spark
        import s2.implicits._
        val probes = Seq("2024-01-01 12:00:00", "2024-01-02 12:00:00",
          "2024-01-03 12:00:00").map(Timestamp.valueOf)
        val facts = probes.zipWithIndex.flatMap { case (ts, i) =>
          codes.map(c => (s"$c-$i", c, ts))
        }.toDF("fact_id", "supplier_code", "fact_ts")
        val joined = graft.ops.Scd2.pointInTime(
          facts, pipeline.staging, "fact_ts", Seq("supplier_code"))
        withClue(s"seed=$seed") {
          joined.count() shouldBe facts.count() // left join never multiplied
        }
        val hist = staging.map(r => (r.getAs[String]("supplier_code"),
          r.getAs[Timestamp]("start_date"),
          Option(r.getAs[Timestamp]("end_date")),
          r.getAs[String]("supplier_state")))
        joined.collect().foreach { r =>
          val code = r.getAs[String]("supplier_code")
          val ts = r.getAs[Timestamp]("fact_ts")
          val valid = hist.filter(h => h._1 == code &&
            !h._2.after(ts) && h._3.forall(e => ts.before(e))).map(_._4)
          withClue(s"seed=$seed code=$code ts=$ts") {
            valid.length should be <= 1
            Option(r.getAs[String]("supplier_state")) shouldBe valid.headOption
          }
        }
      }
    }
  }

  test("window-function oracle reconstructs end dates from bare versions") {
    // Independent recomputation of end_date/current_flag via lead() over
    // (code) — valid when no (code,state) recurs (no return-to-prior-state).
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._

    val store = new TableStore(tmpDir("oracle-store"), spark)
    val stage = new Stage(tmpDir("oracle-stage"))
    val pipeline = new ScdPipeline(spark, store)

    val batches = Seq(
      Seq("1,A101,N1,Delhi", "2,A102,N1,Ranchi"),
      Seq("1,A101,N1,Gujarat"),
      Seq("1,A101,N1,Mumbai", "2,A102,N1,Delhi"))
    batches.zipWithIndex.foreach { case (b, i) =>
      stage.putContent(s"b$i.csv", b.mkString("\n"))
      pipeline.runCycle(stage, Timestamp.valueOf(f"2024-02-0${i + 1} 00:00:00"))
    }

    val w = Window.partitionBy("supplier_code").orderBy("start_date")
    val oracle = pipeline.staging
      .select(col("supplier_code"), col("supplier_state"), col("start_date"))
      .withColumn("end_date_o", lead(col("start_date"), 1).over(w))
      .withColumn("current_flag_o",
        when(col("end_date_o").isNull, "Y").otherwise("N"))

    val joined = pipeline.staging.join(oracle,
      Seq("supplier_code", "supplier_state", "start_date"))
    joined.count() shouldBe pipeline.staging.count()
    joined.filter(
      !(col("end_date") <=> col("end_date_o")) ||
        col("current_flag") =!= col("current_flag_o"))
      .count() shouldBe 0L
  }
}
