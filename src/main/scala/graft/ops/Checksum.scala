package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent table checksum for cross-system reconciliation:
  * one row of `(n_rows, checksum)` where the checksum is the SUM of a
  * 60-bit per-row digest — equal row MULTISETS give equal checksums
  * regardless of row order, partitioning, or engine. The scale answer
  * to "did the load drift?": comparing 100 TB row-by-row (the
  * reference's `compare` does an `except` both ways) costs two
  * full-row shuffles, while this checksum is one map pass + a one-row
  * aggregate on each system, and the 16-byte results travel anywhere.
  * Use it as the cheap first gate; fall back to the row-level compare
  * only when checksums disagree.
  *
  * Per-row digest: each column renders as a fixed-width token —
  * `'0'` for NULL, `'1' || md5(value-string)` otherwise — and the row
  * digest is the top 15 hex chars (60 bits) of the md5 of the
  * concatenated tokens. Tokens are fixed width, so the encoding is
  * INJECTIVE up to md5 collisions: no separator for values to smuggle
  * (`("a|b","c")` vs `("a","b|c")`), no sentinel a real value can
  * collide with (`(NULL,"x")` vs `("","x")`) — different rows
  * digest differently. The sum accumulates in DECIMAL(38,0) — exact
  * at any row count up to 10^20, immune to addition order — and
  * ships as a STRING (decimal physical layouts differ across
  * engines; digit strings do not).
  *
  * Columns must render identically on both systems: integers and
  * strings do; doubles and timestamps have engine-specific string
  * forms — quantize or format them explicitly first.
  *
  * 100 TB shape: map-only digest, partial sums per partition, one
  * final one-row reduce. No shuffle of data rows at all.
  */
object Checksum {

  def checksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"checksum: columns not in frame: $missing")
    val rowStr = concat(cols.map(c =>
      when(col(c).isNull, lit("0"))
        .otherwise(concat(lit("1"), md5(col(c).cast("string"))))): _*)
    val digest = conv(substring(md5(rowStr), 1, 15), 16, 10)
      .cast(DecimalType(38, 0))
    df.agg(count(lit(1)).as("n_rows"),
      sum(digest).cast(DecimalType(38, 0)).cast("string").as("checksum"))
  }

  /** DuckDB rendering of the identical digest-sum over `table`. */
  def checksumSql(table: String, cols: Seq[String], whereClause: String = ""): String = {
    require(cols.nonEmpty, "checksum needs at least one column")
    val rowStr = cols
      .map(c =>
        s"(CASE WHEN $c IS NULL THEN '0' ELSE '1' || md5(CAST($c AS VARCHAR)) END)")
      .mkString(" || ")
    s"""SELECT count(*) AS n_rows,
       |CAST(CAST(SUM(CAST(CAST(('0x' || substr(md5($rowStr), 1, 15)) AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
       |FROM $table $whereClause""".stripMargin
  }
}
