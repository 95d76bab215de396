package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * forms — use [[canonical]] (or the [[checksumCanonical]] wrapper,
  * which dispatches on the frame's schema) to close that edge.
  *
  * 100 TB shape: map-only digest, partial sums per partition, one
  * final one-row reduce. No shuffle of data rows at all.
  */
object Checksum {

  /** Engine-portable rendering of one column for checksumming:
    *
    *   - double/float → `floor(x · 1/quantum)` clamped to ±9e18, as a
    *     long (NaN/±Inf get explicit `nan`/`inf`/`-inf` tokens)
    *   - timestamp → epoch MICROSECONDS as a long (an NTZ timestamp —
    *     what parquet non-UTC-adjusted columns read as — is
    *     interpreted as UTC wall-clock via an explicit-zone cast, NOT
    *     the session zone, matching DuckDB's naive-timestamp
    *     `epoch_us`)
    *   - date → epoch DAYS as an int
    *   - everything else → the plain string cast (engine-stable for
    *     integers, decimals and strings)
    *
    * Why quantize doubles instead of formatting to N significant
    * digits: no built-in formatter is engine-exact. Java's
    * `format_string("%.16e", _)` zero-pads the SHORTEST round-trip
    * representation, while DuckDB/glibc printf correctly rounds the
    * exact binary expansion — `3.14159` renders `3.1415900000000000e+00`
    * vs `3.1415899999999999e+00`, and lower precisions only shrink
    * (not close) the disagreement window. IEEE 754 multiplication,
    * `floor`, and comparison are bit-identical everywhere, so the
    * quantized long is EXACT on both engines; the price is explicit:
    * values closer than `quantum` collide, and magnitudes beyond the
    * ±9e18 clamp saturate. Pick the quantum like a measurement unit
    * (default 1e-6 ≈ micro-precision at unit scale).
    */
  def canonical(c: Column, dt: DataType, quantum: Double = 1e-6): Column = {
    require(quantum > 0 && !quantum.isInfinity && !quantum.isNaN,
      s"quantum $quantum must be a positive finite double")
    dt match {
      case DoubleType | FloatType =>
        val d = c.cast("double")
        // null first: Spark's greatest/least SKIP nulls, so an
        // unguarded null would clamp to -9e18 instead of staying null.
        // clamp BEFORE floor: floor(double) yields a long and would
        // overflow-throw under ansi on huge/infinite products
        when(d.isNull, lit(null).cast("string"))
          .when(isnan(d), lit("nan"))
          .when(d === Double.PositiveInfinity, lit("inf"))
          .when(d === Double.NegativeInfinity, lit("-inf"))
          .otherwise(floor(least(greatest(d * lit(1.0 / quantum),
            lit(-9.0e18)), lit(9.0e18))).cast("string"))
      case TimestampType => unix_micros(c).cast("string")
      case TimestampNTZType =>
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.graftbridge.Bridge
        unix_micros(Bridge.column(Cast(
          Bridge.expression(c), TimestampType, Some("UTC")))).cast("string")
      case DateType => datediff(c, to_date(lit("1970-01-01"))).cast("string")
      case _ => c.cast("string")
    }
  }

  /** DuckDB rendering of [[canonical]] — identical values by
    * construction: IEEE multiply/floor/compare for doubles,
    * `epoch_us`/day-diff for instants. (DuckDB's double→BIGINT cast
    * rounds where Spark's truncates, but the floored product is
    * already integral, so they agree.)
    */
  def canonicalSql(e: String, dt: DataType, quantum: Double = 1e-6): String =
    dt match {
      case DoubleType | FloatType =>
        val scale = s"CAST(${1.0 / quantum} AS DOUBLE)"
        s"(CASE WHEN $e IS NULL THEN NULL" +
          s" WHEN isnan($e) THEN 'nan'" +
          s" WHEN $e = CAST('infinity' AS DOUBLE) THEN 'inf'" +
          s" WHEN $e = CAST('-infinity' AS DOUBLE) THEN '-inf'" +
          s" ELSE CAST(CAST(floor(least(greatest(CAST($e AS DOUBLE) * $scale, -9e18), 9e18)) AS BIGINT) AS VARCHAR) END)"
      case TimestampType | TimestampNTZType => s"CAST(epoch_us($e) AS VARCHAR)"
      case DateType => s"CAST(($e - DATE '1970-01-01') AS VARCHAR)"
      case _ => s"CAST($e AS VARCHAR)"
    }

  def checksum(df: DataFrame, cols: Seq[String]): DataFrame =
    checksumRendered(df, cols, c => col(c).cast("string"))

  /** [[checksum]] with every column first passed through
    * [[canonical]] (dispatched on the frame's schema), so frames
    * carrying doubles, timestamps or dates reconcile engine-exactly
    * without caller-side formatting.
    */
  def checksumCanonical(
      df: DataFrame, cols: Seq[String], quantum: Double = 1e-6): DataFrame =
    checksumRendered(df, cols,
      c => canonical(col(c), df.schema(c).dataType, quantum))

  /** The 60-bit per-row digest column (see the object scaladoc for
    * the injective token encoding) — shared with the per-shard
    * manifest in [[graft.sources.Sources]].
    */
  private[graft] def rowDigest(
      cols: Seq[String], render: String => Column): Column = {
    require(cols.nonEmpty, "checksum needs at least one column")
    val rowStr = concat(cols.map(c =>
      when(col(c).isNull, lit("0"))
        .otherwise(concat(lit("1"), md5(render(c))))): _*)
    conv(substring(md5(rowStr), 1, 15), 16, 10).cast(DecimalType(38, 0))
  }

  /** The order-independent digest SUM as a digit string. */
  private[graft] def digestSum(digest: Column): Column =
    sum(digest).cast(DecimalType(38, 0)).cast("string")

  private def checksumRendered(
      df: DataFrame, cols: Seq[String], render: String => Column): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"checksum: columns not in frame: $missing")
    df.agg(count(lit(1)).as("n_rows"),
      digestSum(rowDigest(cols, render)).as("checksum"))
  }

  /** DuckDB rendering of the identical digest-sum over `table`. */
  def checksumSql(table: String, cols: Seq[String], whereClause: String = ""): String =
    checksumRenderedSql(table, cols.map(c => c -> s"CAST($c AS VARCHAR)"), whereClause)

  /** DuckDB twin of [[checksumCanonical]]: `cols` pairs each column
    * name with its SPARK-side type so both engines render through the
    * same [[canonical]] rules.
    */
  def checksumCanonicalSql(
      table: String, cols: Seq[(String, DataType)],
      whereClause: String = "", quantum: Double = 1e-6): String =
    checksumRenderedSql(table,
      cols.map { case (c, dt) => c -> canonicalSql(c, dt, quantum) }, whereClause)

  /** DuckDB twin of [[digestSum]]∘[[rowDigest]] over rendered
    * `(column, rendering)` pairs — the full SUM expression string.
    */
  private[graft] def digestSumSql(rendered: Seq[(String, String)]): String = {
    require(rendered.nonEmpty, "checksum needs at least one column")
    val rowStr = rendered
      .map { case (c, r) => s"(CASE WHEN $c IS NULL THEN '0' ELSE '1' || md5($r) END)" }
      .mkString(" || ")
    s"CAST(CAST(SUM(CAST(CAST(('0x' || substr(md5($rowStr), 1, 15)) AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR)"
  }

  private def checksumRenderedSql(
      table: String, rendered: Seq[(String, String)], whereClause: String): String =
    s"""SELECT count(*) AS n_rows,
       |${digestSumSql(rendered)} AS checksum
       |FROM $table $whereClause""".stripMargin
}
