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
}
