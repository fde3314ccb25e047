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
    // EMPTY table audits to zero violations instead of null
    val aggs = rules.map(r => count(when(r.violation, lit(1))).as(r.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single aggregate row to (rule, violations) — stack is
    // one projection over the 1-row aggregate output
    val pairs = rules.map(r => s"'${r.name}', `${r.name}`").mkString(", ")
    one.select(expr(s"stack(${rules.size}, $pairs) as (rule, violations)"))
      .select(lit(tbl).as("tbl"), col("rule"), col("violations"))
  }

  /** Uniqueness over a key: violations = total rows − distinct keys
    * (0 when the key is unique). A distinct aggregation, kept separate
    * from [[audit]]'s fused scan so the fused scan stays shuffle-free. */
  def unique(df: DataFrame, tbl: String, keyCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    df.agg((count(lit(1)) - count_distinct(key.head, key.tail: _*))
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
