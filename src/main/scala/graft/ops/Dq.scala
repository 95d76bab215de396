package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * shape): a rule set of named violation predicates evaluated in ONE
  * aggregate pass over the table, reported as one row per rule with
  * violation count, row count, and an integer pass rate in ppm — the
  * go/no-go artifact a 100 TB ingest job gates its publish step on.
  *
  * Null semantics: a predicate evaluating to null does NOT count as a
  * violation (SQL three-valued logic — write an explicit `isNull`
  * rule for null checks), identical in both engines.
  *
  * Shape: all rules fold into a single map-combined aggregation —
  * one corpus pass regardless of rule count; the per-rule explode
  * happens on the 1-row aggregate.
  */
object Dq {

  /** `(rule, n_violations, n_rows, pass_ppm)` — one row per rule in
    * `rules` (name → violation predicate), rule-name ordered by the
    * caller's list.
    */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "Dq.report needs at least one rule")
    // coalesce: SUM over zero rows is null in both engines, and an
    // empty table must report 0 violations, not null
    val aggs = rules.zipWithIndex.map { case ((_, p), i) =>
      coalesce(sum(when(p, lit(1L)).otherwise(lit(0L))), lit(0L))
        .as(s"__v_$i")
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("rule"), col(s"__v_$i").as("n_violations"),
          col("__n").as("n_rows"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"),
        col("r.n_violations").as("n_violations"),
        col("r.n_rows").as("n_rows"),
        when(col("r.n_rows") > 0,
          expr("((r.n_rows - r.n_violations) * 1000000L) div r.n_rows"))
          .as("pass_ppm"))
  }
}
