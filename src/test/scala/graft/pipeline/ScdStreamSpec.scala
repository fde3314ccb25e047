package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.TableStore
import graft.sources.Stage

/** Structured Streaming automation (W2-W4): one AvailableNow pass over the
  * staged files must run the same cycles as batch mode. */
class ScdStreamSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("streaming file source drives full cycles via foreachBatch") {
    val store = new TableStore(tmpDir("stream-store"), spark)
    val stage = new Stage(tmpDir("stream-stage"))
    val pipeline = new ScdPipeline(spark, store)

    stage.putContent("suppliers.csv",
      "1,A101,Kohli,Delhi\n2,A102,Dhoni,Ranchi")

    val q = ScdStream.start(pipeline, stage, tmpDir("stream-ckpt"),
      trigger = Trigger.AvailableNow(), purge = false,
      clock = () => Timestamp.valueOf("2024-03-26 23:41:54.5"))
    q.awaitTermination(60000)

    pipeline.landing.count() shouldBe 2
    pipeline.staging.filter("current_flag = 'Y'").count() shouldBe 2
    pipeline.master.count() shouldBe 2
    pipeline.taskHistory.count() shouldBe 1
  }

  test("streaming cycles maintain registered aggregates (MV refresh per trigger)") {
    val store = new TableStore(tmpDir("mvstream-store"), spark)
    val stage = new Stage(tmpDir("mvstream-stage"))
    val ckpt = tmpDir("mvstream-ckpt")
    val mv = MaterializedAggregate("by_state",
      keys = Seq("supplier_state"), measures = Seq("supplier_key"))
    val pipeline = new ScdPipeline(spark, store,
      config = ScdConfig.supplier.copy(aggregates = Seq(mv)))

    def mvMatchesRecompute(): Unit = {
      val got = pipeline.aggregate("by_state")
        .orderBy("supplier_state").collect().map(_.toSeq).toSeq
      val want = graft.ops.IncrementalAgg.fullAggregate(
          pipeline.landing, mv.keys, mv.measures)
        .orderBy("supplier_state").collect().map(_.toSeq).toSeq
      got shouldBe want
    }

    stage.putContent("b1.csv", "1,A101,Kohli,Delhi\n2,A102,Dhoni,Ranchi")
    val q1 = ScdStream.start(pipeline, stage, ckpt,
      trigger = Trigger.AvailableNow(), purge = false,
      clock = () => Timestamp.valueOf("2024-01-01 00:00:00"))
    q1.awaitTermination(60000)
    mvMatchesRecompute()

    // second trigger: an update (Delhi → Goa) and an insert arrive as a
    // stream delta; the MV refresh is signed application of that delta
    stage.putContent("b2.csv", "1,A101,Kohli,Goa\n3,A103,Pujara,Gujarat")
    val q2 = ScdStream.start(pipeline, stage, ckpt,
      trigger = Trigger.AvailableNow(), purge = false,
      clock = () => Timestamp.valueOf("2024-01-02 00:00:00"))
    q2.awaitTermination(60000)
    mvMatchesRecompute()
    val states = pipeline.aggregate("by_state")
      .collect().map(_.getString(0)).toSet
    states should contain("Goa")
    states should not contain "Delhi" // count hit 0 → evicted
  }

  test("restart with the same checkpoint is exactly-once per input file") {
    val store = new TableStore(tmpDir("rs-store"), spark)
    val stage = new Stage(tmpDir("rs-stage"))
    val ckpt = tmpDir("rs-ckpt")
    val pipeline = new ScdPipeline(spark, store)

    stage.putContent("b1.csv", "1,A101,Kohli,Delhi")
    val q1 = ScdStream.start(pipeline, stage, ckpt,
      trigger = Trigger.AvailableNow(), purge = false,
      clock = () => Timestamp.valueOf("2024-01-01 00:00:00"))
    q1.awaitTermination(60000)
    pipeline.taskHistory.count() shouldBe 1

    // restart over the same checkpoint: the already-processed file is in
    // the source log (COPY's load history) — no new cycle runs
    val q2 = ScdStream.start(pipeline, stage, ckpt,
      trigger = Trigger.AvailableNow(), purge = false,
      clock = () => Timestamp.valueOf("2024-01-02 00:00:00"))
    q2.awaitTermination(60000)
    pipeline.taskHistory.count() shouldBe 1
    pipeline.staging.count() shouldBe 1

    // a new file after restart is picked up
    stage.putContent("b2.csv", "2,A102,Dhoni,Ranchi")
    val q3 = ScdStream.start(pipeline, stage, ckpt,
      trigger = Trigger.AvailableNow(), purge = false,
      clock = () => Timestamp.valueOf("2024-01-03 00:00:00"))
    q3.awaitTermination(60000)
    pipeline.taskHistory.count() shouldBe 2
    pipeline.staging.count() shouldBe 2
  }
}
