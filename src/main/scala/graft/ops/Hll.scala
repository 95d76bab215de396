package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog — the register construction and raw
  * estimator spelled out in engine-portable arithmetic, so the WHOLE
  * sketch sits under the exact-value oracle gate (Spark's builtin
  * `approx_count_distinct` IS HyperLogLog++, but its hash and
  * register layout are engine-private and cannot be cross-checked
  * value-for-value; same reasoning as [[Sketches.kmvDistinct]]).
  *
  * Layout: the [[Sketches.kmvHash]] 60-bit md5 hash splits into an
  * 8-bit bucket (top bits, m = 256 registers) and a 52-bit remainder;
  * a register holds `rho` = position of the remainder's leftmost
  * 1-bit = `53 - bitlength(rem)` (53 for the all-zero remainder).
  * Bit length is `length(bin(x))` — a STRING length, identical in
  * both engines (Java `Long.toBinaryString` ≡ DuckDB `bin` modulo
  * leading-zero stripping), so no `log2` rounding hazard enters.
  *
  * The estimator's harmonic denominator is kept as an INTEGER:
  * `z_scaled = Σ_j 2^(53 - M_j)` with empty registers contributing
  * `2^53` — at most `256·2^53 = 2^61`, exact in BIGINT. The raw
  * estimate `alpha_m·m²·2^53 / z_scaled` is then ONE IEEE division
  * by a double constant rendered via shortest-round-trip
  * `Double.toString`, so the double hashes raw across engines. The
  * small-range linear-counting correction needs `ln` (not correctly
  * rounded, engine-divergent) — `v_zero` is emitted so consumers can
  * apply it; the gate pins the uncorrected estimator.
  *
  * 100 TB shape: the register build is `groupBy(bucket).max(rho)` —
  * 256 groups, map-side partial max, and NO distinct/dedup shuffle:
  * `max` is idempotent over duplicate values, which is exactly the
  * property that makes HLL mergeable and why it beats KMV's
  * distinct-first pipeline at scale (KMV must dedup before its heap;
  * HLL never materializes distinct values at all). Register frames
  * merge across shards/streams by the same `max` ([[mergeRegisters]]).
  */
object Hll {

  /** 2^52 mask for the remainder bits under the 8-bit bucket. */
  private val RemMask = 4503599627370495L

  /** rho of the 52-bit remainder column: leftmost-1 position, 53 for
    * zero.
    */
  private def rho(rem: Column): Column =
    when(rem === 0L, lit(53)).otherwise(lit(53) - length(bin(rem))).cast("int")

  /** `(bucket, r)` register frame — see object scaladoc. */
  def registerFrame(df: DataFrame, valueCol: String): DataFrame = {
    val h = Sketches.kmvHash(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .select(shiftrightunsigned(h, 52).as("bucket"),
        rho(h.bitwiseAND(lit(RemMask))).as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("r"))
  }

  /** Merge register frames from independent shards: per-bucket max —
    * associative, commutative, duplicate-blind.
    */
  def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket")).agg(max(col("r")).as("r"))

  /** Per-group distinct estimates: one register set per group key
    * (≤256 `(g, bucket)` rows/group — 2 KB of aggregate state per
    * domain/source at ANY cardinality), then the [[estimate]]
    * arithmetic per group. The per-domain census a mixture planner
    * reads without ever shuffling distinct values. Output:
    * `(groupCol, n_buckets, v_zero, z_scaled, est_raw)`.
    */
  def distinctPerGroup(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val h = Sketches.kmvHash(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        shiftrightunsigned(h, 52).as("bucket"),
        rho(h.bitwiseAND(lit(RemMask))).as("rho"))
      .groupBy(col("g"), col("bucket"))
      .agg(max(col("rho")).as("r"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("int").as("n_buckets"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))"))
          .as("z_present"))
      .select(col("g").as(groupCol), col("n_buckets"),
        (lit(M) - col("n_buckets")).cast("int").as("v_zero"),
        (col("z_present") +
          (lit(M.toLong) - col("n_buckets").cast("long")) * lit(Pow53))
          .as("z_scaled"))
      .select(col(groupCol), col("n_buckets"), col("v_zero"), col("z_scaled"),
        (lit(AlphaNumerator) / col("z_scaled").cast("double")).as("est_raw"))
  }

  /** DuckDB rendering of [[distinctPerGroup]] over
    * `table.(groupCol, valueCol)`.
    */
  def distinctPerGroupSql(
      table: String, groupCol: String, valueCol: String): String = {
    val (hi, _) = Sketches.kmvHashSql(valueCol)
    s"""WITH br AS (SELECT $groupCol AS g, ($hi >> 52) AS bucket,
       |    CAST(CASE WHEN ($hi & $RemMask) = 0 THEN 53
       |         ELSE 53 - length(bin($hi & $RemMask)) END AS INT) AS rho
       |  FROM $table WHERE $valueCol IS NOT NULL),
       |regs AS (SELECT g, bucket, MAX(rho) AS r FROM br GROUP BY g, bucket),
       |agg AS (SELECT g, CAST(COUNT(*) AS INT) AS n_buckets,
       |    SUM(1::BIGINT << (53 - r)) AS z_present FROM regs GROUP BY g)
       |SELECT g AS $groupCol, n_buckets,
       |  CAST($M - n_buckets AS INT) AS v_zero,
       |  CAST(z_present + ($M - n_buckets)::BIGINT * $Pow53 AS BIGINT)
       |    AS z_scaled,
       |  $AlphaNumerator / CAST(z_present + ($M - n_buckets)::BIGINT * $Pow53
       |    AS DOUBLE) AS est_raw
       |FROM agg ORDER BY $groupCol""".stripMargin
  }

  private val M = 256
  private val Pow53 = 9007199254740992L // 2^53

  /** `alpha_256 · 256² · 2^53` — the scaled estimator numerator,
    * computed once here and rendered into both engines via
    * `Double.toString`.
    */
  val AlphaNumerator: Double =
    0.7213 / (1.0 + 1.079 / M) * M * M * Pow53.toDouble

  /** One-row estimate from a register frame: `(n_buckets, v_zero,
    * z_scaled, est_raw)`.
    */
  def estimate(regs: DataFrame): DataFrame =
    regs.agg(count(lit(1)).cast("int").as("n_buckets"),
        // coalesce: an EMPTY register frame (no non-null input at
        // all) sums to NULL; all-empty registers must yield z = m·2^53
        coalesce(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))")),
          lit(0L)).as("z_present"))
      .select(col("n_buckets"),
        (lit(M) - col("n_buckets")).as("v_zero"),
        (col("z_present") +
          (lit(M.toLong) - col("n_buckets").cast("long")) * lit(Pow53))
          .as("z_scaled"))
      .select(col("n_buckets"), col("v_zero").cast("int").as("v_zero"),
        col("z_scaled"),
        (lit(AlphaNumerator) / col("z_scaled").cast("double")).as("est_raw"))

  /** One-call distinct estimate of `table.valueCol`. */
  def distinctEstimate(df: DataFrame, valueCol: String): DataFrame =
    estimate(registerFrame(df, valueCol))

  /** DuckDB rendering of the `(bucket, rho)` pre-aggregation rows for
    * value expression `v` (shared by both oracle renderers).
    */
  private def bucketRhoSql(table: String, valueCol: String): String = {
    val (hi, _) = Sketches.kmvHashSql(valueCol)
    s"""SELECT ($hi >> 52) AS bucket,
       |    CAST(CASE WHEN ($hi & $RemMask) = 0 THEN 53
       |         ELSE 53 - length(bin($hi & $RemMask)) END AS INT) AS rho
       |  FROM $table WHERE $valueCol IS NOT NULL""".stripMargin
  }

  /** DuckDB rendering of [[registerFrame]] over `table.valueCol`. */
  def registersSql(table: String, valueCol: String): String =
    s"""WITH br AS (${bucketRhoSql(table, valueCol)})
       |SELECT bucket, MAX(rho) AS r FROM br GROUP BY bucket
       |ORDER BY bucket""".stripMargin

  /** DuckDB rendering of [[distinctEstimate]] over `table.valueCol`. */
  def estimateSql(table: String, valueCol: String): String =
    s"""WITH br AS (${bucketRhoSql(table, valueCol)}),
       |regs AS (SELECT bucket, MAX(rho) AS r FROM br GROUP BY bucket),
       |agg AS (SELECT CAST(COUNT(*) AS INT) AS n_buckets,
       |    COALESCE(SUM(1::BIGINT << (53 - r)), 0) AS z_present FROM regs)
       |SELECT n_buckets, CAST($M - n_buckets AS INT) AS v_zero,
       |  CAST(z_present + ($M - n_buckets)::BIGINT * $Pow53 AS BIGINT)
       |    AS z_scaled,
       |  $AlphaNumerator / CAST(z_present + ($M - n_buckets)::BIGINT * $Pow53
       |    AS DOUBLE) AS est_raw
       |FROM agg""".stripMargin
}
