package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-row and cross-table integrity audits — the data-quality
  * checks [[Dq]]'s single-row expectations can't express: functional
  * dependencies (does `det → dep` actually hold?) and referential
  * integrity (which foreign keys point at nothing?). Both are
  * census-shaped at 100 TB: one keyed aggregate, one anti join — the
  * profiling pass a pipeline runs before trusting a join key or a
  * dimension hierarchy.
  */
object Integrity {

  /** Keys violating the functional dependency `det → dep`: one row
    * per determinant value mapping to MORE than one dependent value,
    * with its multiplicity. One map-combined census (distinct over
    * `(det, dep)` first keeps combiner state at the true pair
    * cardinality); output is violation-sized.
    */
  def fdViolations(
      df: DataFrame, det: Seq[String], dep: String): DataFrame =
    df.groupBy(det.map(col): _*)
      .agg(countDistinct(col(dep)).as("ndv_dep"),
        count(lit(1)).as("n_rows"))
      .filter(col("ndv_dep") > 1)

  /** Summary over candidate FDs: `(fd, n_keys, n_violating_keys)` —
    * a violating count of 0 means the dependency HOLDS on this data
    * (the discovery form: propose candidates, keep the zeros).
    */
  def fdSummary(
      df: DataFrame, fds: Seq[(String, Seq[String], String)]): DataFrame = {
    require(fds.nonEmpty, "no candidate FDs")
    fds.map { case (name, det, dep) =>
      df.groupBy(det.map(col): _*)
        .agg(countDistinct(col(dep)).as("ndv_dep"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("ndv_dep") > 1, 1L).otherwise(0L))
            .as("n_violating_keys"))
        .select(lit(name).as("fd"), col("n_keys"),
          col("n_violating_keys"))
    }.reduce(_.unionByName(_))
  }

  /** DuckDB rendering of [[fdSummary]] over `table`. */
  def fdSummarySql(
      table: String, fds: Seq[(String, Seq[String], String)],
      whereClause: String = ""): String =
    fds.map { case (name, det, dep) =>
      val d = det.mkString(", ")
      s"""SELECT '$name' AS fd, CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(CASE WHEN ndv_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violating_keys
         |FROM (SELECT $d, count(DISTINCT $dep) AS ndv_dep
         |  FROM $table $whereClause GROUP BY $d) g""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY fd"

  /** Referential-integrity audit: child rows whose `fk` has no match
    * in the parent's `pk` set. One row:
    * `(n_child_rows, n_orphan_rows, n_orphan_keys)`. The orphan
    * detection is a key-projected anti join against the DISTINCT
    * parent key set (dimension-sized — broadcastable for real
    * dimensions); null FKs are not orphans (SQL's stance: a null FK
    * is "unknown", flagged by a NOT NULL expectation instead).
    */
  def riAudit(
      child: DataFrame, fk: String, parent: DataFrame, pk: String,
  ): DataFrame = {
    val keys = child.filter(col(fk).isNotNull)
      .groupBy(col(fk).as("k")).agg(count(lit(1)).as("n"))
    val orphans = keys.join(
      parent.select(col(pk).as("k")).distinct(), Seq("k"), "left_anti")
    val tot = child.agg(count(lit(1)).as("n_child_rows"))
    tot.crossJoin(
      orphans.agg(coalesce(sum(col("n")), lit(0L)).as("n_orphan_rows"),
        count(lit(1)).as("n_orphan_keys")))
  }

  /** DuckDB rendering of [[riAudit]]. */
  def riAuditSql(
      childFrom: String, fk: String, parentFrom: String, pk: String): String =
    s"""WITH k AS (SELECT $fk AS k, count(*) AS n FROM $childFrom
       |  WHERE $fk IS NOT NULL GROUP BY $fk),
       |o AS (SELECT k.k, k.n FROM k
       |  WHERE NOT EXISTS (SELECT 1 FROM $parentFrom p WHERE p.$pk = k.k)),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n_child_rows
       |  FROM $childFrom)
       |SELECT n_child_rows,
       |  (SELECT CAST(coalesce(SUM(n), 0) AS BIGINT) FROM o)
       |    AS n_orphan_rows,
       |  (SELECT CAST(count(*) AS BIGINT) FROM o) AS n_orphan_keys
       |FROM t""".stripMargin
}
