package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event log —
  * the two canonical product-analytics queries, shaped for a 100 TB
  * event table.
  *
  * Funnel semantics: a user "reaches" step j when some step-j event
  * strictly follows the event that completed step j−1 (each step's
  * completion time is the EARLIEST qualifying event — the standard
  * min-cascade definition, so a user converts iff the steps occur as a
  * subsequence in time order).
  *
  * Scalable shape: ONE shuffle. Events are filtered to the step types
  * at the scan (predicate pushdown on `event_type`), reduced to slim
  * `(ts, type_idx)` structs, grouped per user, and the cascade is a
  * single sorted fold (`aggregate` HOF — the [[Curation.packSequences]]
  * precedent: sequential logic as a Catalyst expression, no UDF). The
  * alternative — one join+agg round per step — rescans the corpus
  * `k` times and shuffles `k` times; the fold does it in one pass with
  * per-user state of exactly `k` timestamps. Per-user event lists are
  * bounded by user activity, not corpus size.
  */
object Funnel {

  /** Per-step conversion counts for the ordered funnel `steps`.
    * Output: `(step, step_name, n_users)` — `n_users` at step j counts
    * users whose fold filled slot j (monotonically non-increasing); a
    * step no user reaches still emits its row with `n_users = 0`.
    *
    * `withinSeconds` is the standard conversion window: step j only
    * counts when it lands within that interval of step j−1's completion
    * (strictly after it either way). Comparison is exact timestamp
    * arithmetic (microsecond interval add), never a seconds-truncated
    * cast, so boundary events resolve identically cross-engine. */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      withinSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.length
    // slim (user, ts, type) relation; only step-typed events survive the
    // scan. The TYPE travels into the fold (not a precomputed step index):
    // a funnel may legitimately repeat a step ("view → view"), where one
    // event type matches several slots and the cascade state decides
    // which one fills.
    val slim = events
      .filter(col(typeCol).isInCollection(steps))
      .select(col(userCol).as("__u"), struct(col(tsCol).as("ts"),
        col(typeCol).as("tp")).as("__e"))
    // one shuffle: per-user sorted fold over the cascade state. Each
    // event may only fill the FIRST unfilled slot whose predecessor was
    // filled before this fold step (conditions read the prior state, so
    // repeated step types cannot cascade within one event).
    val inWindow: (Column, Column) => Column = withinSeconds match {
      case Some(w) => (ts, prev) =>
        ts > prev && ts <= prev + expr(s"INTERVAL $w SECOND")
      case None => (ts, prev) => ts > prev
    }
    // one fold step reads the PRIOR state for every slot, so an event
    // fills at most one slot: filled slots always form a prefix, and
    // "fill j" (prior acc[j] null) and "fill j+1" (prior acc[j] set) are
    // mutually exclusive for a single event.
    val stepLit = typedlit(steps)
    val state = aggregate(
      array_sort(collect_list(col("__e"))),
      array_repeat(lit(null).cast("timestamp"), k),
      (acc: Column, e: Column) =>
        transform(sequence(lit(0), lit(k - 1)), j =>
          when(element_at(acc, j + 1).isNotNull, element_at(acc, j + 1))
            .when(e.getField("tp") === element_at(stepLit, j + 1) &&
              (j === 0 || (element_at(acc, j).isNotNull &&
                inWindow(e.getField("ts"), element_at(acc, j)))),
              e.getField("ts"))))
    val perUser = slim.groupBy("__u").agg(state.as("__state"))
    val counts = perUser
      .select(explode(expr(
        "filter(transform(__state, (t, j) -> struct(j, t)), x -> x.t IS NOT NULL)"
      )).as("s"))
      .groupBy(col("s.j").cast("long").as("step"))
      .agg(count(lit(1)).as("n_users"))
    // all k steps always present (an unreached step is a 0 row, matching
    // the closed-form per-step oracle)
    val spark = events.sparkSession
    import spark.implicits._
    steps.zipWithIndex.map { case (s, j) => (j.toLong, s) }
      .toDF("step", "step_name")
      .join(counts, Seq("step"), "left")
      .select(col("step"), col("step_name"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /** Weekly cohort retention: users bucketed by the ISO week of their
    * first event; a (cohort, offset) cell counts users with any event
    * in the week `offset` weeks after their cohort week. Output:
    * `(cohort_week 'yyyy-MM-dd', week_offset, n_users)`.
    *
    * One shuffle for the first-event time (window min over the user —
    * the same exchange the distinct/agg needs anyway, so the corpus is
    * scanned once), then a slim `(cohort, offset, user)` distinct+agg. */
  def weeklyRetention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    events
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      .withColumn("__first",
        min(col("__ts")).over(Window.partitionBy(col("__u"))))
      .select(
        date_format(date_trunc("week", col("__first")), "yyyy-MM-dd")
          .as("cohort_week"),
        (datediff(date_trunc("week", col("__ts")),
          date_trunc("week", col("__first"))) / 7).cast("long")
          .as("week_offset"),
        col("__u"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
