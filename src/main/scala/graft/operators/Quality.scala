package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test / Deequ-style
  * audit): each table declares rules — not-null, uniqueness, accepted
  * range, accepted set, referential integrity — and the audit emits one
  * `(tbl, rule, violations)` row per rule.
  *
  * 100 TB shape: ALL single-table rules for one table fuse into ONE
  * conditional-aggregate scan (`sum(case when …)` per rule — one pass,
  * partial-combined, no shuffle of data rows; a uniqueness rule adds its
  * distinct-count to the same aggregate). Referential-integrity rules are
  * anti-join counts — broadcast when the dimension side is small, plain
  * shuffled anti-join otherwise. The audit output is rules-sized (tiny),
  * so gating a pipeline on it reads one number per rule, never data.
  */
object Quality {

  /** A single-table rule: `name` labels the output row, `violation` is a
    * boolean Column that is true on rows BREAKING the expectation. */
  final case class Rule(name: String, violation: Column)

  def notNull(c: String): Rule =
    Rule(s"not_null:$c", col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range:$c:[$lo,$hi]", col(c).isNull || col(c) < lo || col(c) > hi)

  def inSet(c: String, allowed: Seq[String]): Rule =
    Rule(s"in_set:$c", col(c).isNull || !col(c).isInCollection(allowed))

  def nonNegative(c: String): Rule =
    Rule(s"non_negative:$c", col(c).isNull || col(c) < 0)

  /** All `rules` for `df` in ONE scan: each rule becomes a conditional
    * count in a single global aggregate. Output `(tbl, rule, violations)`
    * sorted by rule name. */
  def audit(df: DataFrame, tbl: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    // count(when(...)) not sum: count of an all-null column is 0, so an
    // EMPTY table audits to zero violations instead of null. Aggregates
    // alias to positional names and rule labels enter as typed lit()s —
    // nothing user-derived is ever parsed as SQL text, so a rule named
    // after a column with quotes/backticks can't break or inject (the
    // earlier stack(expr) unpivot interpolated names into a parsed
    // string)
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      count(when(r.violation, lit(1))).as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single aggregate row via explode over typed structs —
    // one projection over the 1-row aggregate output
    one.select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"__v$i").as("violations"))
      }: _*)).as("kv"))
      .select(lit(tbl).as("tbl"), col("kv.rule").as("rule"),
        col("kv.violations").as("violations"))
  }

  /** Uniqueness over a key: violations = total rows − distinct keys
    * (0 when the key is unique). A distinct aggregation, kept separate
    * from [[audit]]'s fused scan so the fused scan stays shuffle-free.
    * The key is wrapped in a struct before count_distinct: a bare
    * multi-column count_distinct DROPS rows with any NULL key column
    * (SQL aggregate semantics), while a struct is itself non-null, so
    * NULL-containing keys count as distinct values — matching the
    * `count(*) FROM (SELECT DISTINCT …)` oracle semantics and treating
    * duplicate all-NULL keys as duplicates. Declare a separate
    * [[notNull]] rule when NULL keys should themselves be violations. */
  def unique(df: DataFrame, tbl: String, keyCols: Seq[String]): DataFrame = {
    val key = struct(keyCols.map(col): _*)
    df.agg((count(lit(1)) - count_distinct(key))
        .as("violations"))
      .select(lit(tbl).as("tbl"),
        lit(s"unique:${keyCols.mkString(",")}").as("rule"),
        col("violations"))
  }

  /** Referential integrity `fact.fkCol ⊆ dim.pkCol`: violations = fact
    * rows with a non-null key absent from the dimension (an anti-join
    * count; Spark broadcasts the dim side when it is small — the normal
    * case for RI checks). NULL keys are not violations here — declare a
    * separate [[notNull]] rule when they should be. */
  def refIntegrity(fact: DataFrame, tbl: String, fkCol: String,
      dim: DataFrame, pkCol: String): DataFrame =
    fact.filter(col(fkCol).isNotNull)
      .join(dim.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(tbl).as("tbl"),
        lit(s"ref:$fkCol").as("rule"), col("violations"))
}
