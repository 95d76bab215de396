package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-cardinality estimation — the System R planner formula
  * every cost-based optimizer runs before picking a join strategy:
  * under the uniformity + containment assumptions,
  *
  *   |A ⋈ B|  ≈  |A| · |B| / max(ndv_A, ndv_B)
  *
  * (Selinger et al. 1979). As an OPERATOR the estimate earns its
  * keep at 100 TB deciding — from metadata-priced inputs — whether a
  * planned join is broadcastable, shuffle-safe, or about to explode
  * (a fan-out join whose estimate exceeds both inputs by orders of
  * magnitude is a red flag BEFORE the shuffle runs, not after).
  *
  * Integer exactness: the estimate is computed as
  * `(n_a div m) * n_b + ((n_a % m) * n_b) div m` with
  * `m = max(ndv_a, ndv_b)` — algebraically EQUAL to
  * `(n_a * n_b) div m` (write `n_a = q·m + r`; the q·m term divides
  * exactly) while never forming the full n_a·n_b product, which
  * overflows BIGINT when both sides pass ~3·10⁹ rows. Engine-
  * identical floor division on non-negative counts.
  *
  * The gate row carries the EXACT join count alongside, so the
  * estimate's error is itself pinned data — the honest way to ship a
  * heuristic. Scale shape: two single-pass input summaries
  * (count + exact ndv; swap in [[Sketches]] KMV / [[Hll]] registers
  * when the key census itself is too hot), one key-projected equi
  * join for the exact arm (drop it in production — it costs the
  * join being estimated), and a 1×1×1 cross of the summaries.
  */
object JoinStats {

  /** One row: `(n_a, n_b, ndv_a, ndv_b, est_rows, exact_rows)`. */
  def joinSizeEstimate(
      a: DataFrame, b: DataFrame, keyA: String, keyB: String): DataFrame = {
    val sa = a.agg(count(lit(1)).as("n_a"),
      countDistinct(col(keyA)).as("ndv_a"))
    val sb = b.agg(count(lit(1)).as("n_b"),
      countDistinct(col(keyB)).as("ndv_b"))
    val exact = a.select(col(keyA).as("k"))
      .join(b.select(col(keyB).as("k")), Seq("k"))
      .agg(count(lit(1)).as("exact_rows"))
    sa.crossJoin(sb).crossJoin(exact)
      .select(col("n_a"), col("n_b"), col("ndv_a"), col("ndv_b"),
        expr("(n_a div greatest(ndv_a, ndv_b)) * n_b + " +
          "((n_a % greatest(ndv_a, ndv_b)) * n_b) " +
          "div greatest(ndv_a, ndv_b)").as("est_rows"),
        col("exact_rows"))
  }

  /** DuckDB rendering of [[joinSizeEstimate]] over two FROM clauses
    * (table names or parenthesized subqueries with alias).
    */
  def joinSizeEstimateSql(
      fromA: String, keyA: String, fromB: String, keyB: String): String =
    s"""WITH sa AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
       |    CAST(count(DISTINCT $keyA) AS BIGINT) AS ndv_a FROM $fromA),
       |sb AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
       |    CAST(count(DISTINCT $keyB) AS BIGINT) AS ndv_b FROM $fromB),
       |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_rows
       |  FROM (SELECT $keyA AS k FROM $fromA) xa
       |  JOIN (SELECT $keyB AS k FROM $fromB) xb ON xa.k = xb.k)
       |SELECT n_a, n_b, ndv_a, ndv_b,
       |  (n_a // greatest(ndv_a, ndv_b)) * n_b +
       |    ((n_a % greatest(ndv_a, ndv_b)) * n_b)
       |    // greatest(ndv_a, ndv_b) AS est_rows,
       |  exact_rows
       |FROM sa, sb, ex""".stripMargin
}
