package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ResampleSpec extends AnyFunSuite with Matchers with SparkSpec {

  import org.apache.spark.sql.functions._

  private def ev(rows: (Long, Long, String, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts", "grp", "v")
  }

  test("ohlc: hand-computed buckets, id tiebreak at equal timestamps, " +
      "null rows dropped") {
    val s = spark
    import s.implicits._
    // bucket width 10: bucket 0 holds ts 0..9, bucket 1 holds 10..19
    val df = ev(
      (1L, 5L, "a", 3.0), // bucket 0: first by (ts, id) → open
      (2L, 5L, "a", 7.0), // same ts, higher id — must NOT be open
      (3L, 9L, "a", 1.0), // last → close, and the low
      (4L, 12L, "a", 4.0), // bucket 1, alone: open=close=high=low
      (5L, 3L, "b", 9.0))
    val got = Resample.ohlc(df, "ts", "grp", "v", "event_id", 10L)
      .orderBy("grp", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7)))
      .toList
    got shouldBe List(
      ("a", 0L, 3.0, 7.0, 1.0, 1.0, 3L, 11.0),
      ("a", 1L, 4.0, 4.0, 4.0, 4.0, 1L, 4.0),
      ("b", 0L, 9.0, 9.0, 9.0, 9.0, 1L, 9.0))
    // null ts / null value rows contribute nothing
    val withNulls = df.unionByName(
      Seq[(java.lang.Long, java.lang.Long, String, java.lang.Double)](
        (9L, null, "a", 5.0), (10L, 4L, "a", null)).toDF(
        "event_id", "ts", "grp", "v"))
    Resample.ohlc(withNulls, "ts", "grp", "v", "event_id", 10L)
      .orderBy("grp", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(6))).toList shouldBe
      List(("a", 0L, 3L), ("a", 1L, 1L), ("b", 0L, 1L))
    // pre-epoch timestamps FLOOR downward: ts −5 is bucket −1 (−10..−1),
    // never merged into bucket 0 by truncate-toward-zero
    Resample.ohlc(ev((1L, -5L, "a", 2.0), (2L, 3L, "a", 4.0)),
        "ts", "grp", "v", "event_id", 10L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getLong(6))).toList shouldBe
      List((-1L, 1L), (0L, 1L))
  }

  test("gapFill: spine densifies to the global span, forward fill with " +
      "provenance, leading gaps stay null") {
    val s = spark
    import s.implicits._
    // series a observed at buckets 2 and 5; series b only at 4 — the
    // global span is 2..5, so a gets fills at 3, 4 and b a leading gap
    // at 2, 3 plus a fill at 5
    val sparse = Seq(
      ("a", 2L, 10.0), ("a", 5L, 50.0), ("b", 4L, 40.0))
      .toDF("grp", "bucket", "close")
    val got = Resample.gapFill(sparse, "grp", "bucket", Seq("close"))
      .orderBy("grp", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getString(3)))
      .toList
    got shouldBe List(
      ("a", 2L, Some(10.0), "obs"),
      ("a", 3L, Some(10.0), "fill"),
      ("a", 4L, Some(10.0), "fill"),
      ("a", 5L, Some(50.0), "obs"),
      ("b", 2L, None, "fill"), // leading gap: never invent backwards
      ("b", 3L, None, "fill"),
      ("b", 4L, Some(40.0), "obs"),
      ("b", 5L, Some(40.0), "fill"))
  }

  test("gapFill composes with ohlc: a filled row carries the last " +
      "observed close, observed rows keep their own") {
    val df = ev(
      (1L, 0L, "a", 2.0), (2L, 1L, "a", 8.0), // bucket 0: close 8
      (3L, 25L, "a", 5.0)) // bucket 2: close 5; bucket 1 is a gap
    val r = Resample.ohlc(df, "ts", "grp", "v", "event_id", 10L)
    val got = Resample.gapFill(r, "grp", "bucket", Seq("close"))
      .orderBy("grp", "bucket").collect()
      .map(x => (x.getLong(x.fieldIndex("bucket")),
        x.getDouble(x.fieldIndex("close")),
        x.getString(x.fieldIndex("src")))).toList
    got shouldBe List((0L, 8.0, "obs"), (1L, 8.0, "fill"), (2L, 5.0, "obs"))
  }
}
