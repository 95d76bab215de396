package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation over activity spans — the
  * censoring-aware retention curve ([[Cohort.retention]]'s grid
  * answers "who came back at offset k"; this answers "what fraction
  * SURVIVES past duration t" when the observation window cuts many
  * lifetimes short). A user whose last activity sits within
  * `gapDays` of the horizon has not provably churned — counting them
  * dead biases retention down, dropping them biases it up; KM handles
  * them as right-censored: they leave the at-risk set at their
  * observed duration without counting as a death.
  *
  * Estimator: with `n_t` at risk entering duration `t`, `d_t` deaths
  * and `c_t` censorings at `t`, `S_t = S_(t-1) * (n_t - d_t) / n_t`.
  *
  * Determinism: the product is an ORDERED fold of rationals, so both
  * engines must execute the identical operation sequence — and unlike
  * [[Ewma]] (whose three IEEE ops per step are correctly rounded and
  * thus portable), a floating product then a floor would hinge on
  * each libm's division rounding at every step. The recurrence here
  * is ALL-INTEGER instead: survival in ppm, each step
  * `s' = (s * (n_t - d_t)) div n_t` (exact long arithmetic —
  * `s <= 10^6`, `n_t` bounded by the cohort, the product far below
  * 2^62). The per-step floor under-counts by at most 1 ppm per
  * distinct duration — noise at any real cohort size, in exchange for
  * a hash-gateable curve.
  *
  * 100 TB shape: one user-keyed aggregate (spans), a 1-row horizon
  * broadcast, one duration-keyed census — and everything after runs
  * on the CENSUS frame, sized by the distinct-duration count (days in
  * the window — metadata, the shard-manifest stance), so the
  * single-partition cumulative window and the one-row array fold
  * (the codegen'd `aggregate` HOF, same device as [[Ewma]]) never
  * touch row-scale data.
  *
  * Output: `(t, n_risk, n_death, n_censor, s_ppm)` per observed
  * duration, ordered by `t`.
  */
object Survival {

  /** KM curve over per-key activity: a key's observed lifetime is
    * `max(dayCol) - min(dayCol)`; it counts as a death if its last
    * day is at least `gapDays` before the horizon (the global max
    * last day), censored otherwise. `dayCol` must be integral.
    */
  def kaplanMeier(
      df: DataFrame, keyCol: String, dayCol: String, gapDays: Int,
  ): DataFrame = {
    require(gapDays >= 0, s"gapDays $gapDays must be >= 0")
    val spans = df.groupBy(col(keyCol))
      .agg(min(col(dayCol).cast("long")).as("__fd"),
        max(col(dayCol).cast("long")).as("__ld"))
    val horizon = spans.agg(max(col("__ld")).as("__h"))
    val obs = spans.crossJoin(broadcast(horizon))
      .select((col("__ld") - col("__fd")).as("t"),
        when(col("__ld") + gapDays <= col("__h"), lit(1L))
          .otherwise(lit(0L)).as("__death"))
    val census = obs.groupBy(col("t"))
      .agg(sum(col("__death")).as("n_death"),
        sum(lit(1L) - col("__death")).as("n_censor"))
    val total = census.agg(
      sum(col("n_death") + col("n_censor")).as("__total"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val risk = census.crossJoin(broadcast(total))
      .withColumn("n_risk", col("__total") -
        coalesce(sum(col("n_death") + col("n_censor")).over(w), lit(0L)))
      .select(col("t"), col("n_risk"), col("n_death"), col("n_censor"))
    // the ordered integer fold: one array over the census, exploded
    // back out with each step's survival attached
    risk.agg(array_sort(collect_list(struct(
        col("t"), col("n_risk"), col("n_death"), col("n_censor"))))
        .as("__arr"))
      .select(explode(expr(
        """aggregate(
          |  __arr,
          |  named_struct('s', 1000000L, 'rows',
          |    cast(array() as array<struct<
          |      t: bigint, n_risk: bigint, n_death: bigint,
          |      n_censor: bigint, s_ppm: bigint>>)),
          |  (acc, x) -> named_struct(
          |    's', (acc.s * (x.n_risk - x.n_death)) div x.n_risk,
          |    'rows', concat(acc.rows, array(named_struct(
          |      't', x.t, 'n_risk', x.n_risk, 'n_death', x.n_death,
          |      'n_censor', x.n_censor,
          |      's_ppm', (acc.s * (x.n_risk - x.n_death)) div x.n_risk)))),
          |  acc -> acc.rows)""".stripMargin)).as("r"))
      .select(col("r.*"))
  }

  /** DuckDB rendering of [[kaplanMeier]]: same censuses, the fold as
    * a recursive CTE stepping one duration rank at a time with the
    * identical integer recurrence. `daysClause` must yield
    * `(user_id, day)` rows.
    */
  def kaplanMeierSql(daysClause: String, gapDays: Int): String =
    s"""WITH RECURSIVE days AS MATERIALIZED ($daysClause),
       |span AS (SELECT user_id, min(day) AS fd, max(day) AS ld
       |  FROM days GROUP BY 1),
       |hz AS (SELECT max(ld) AS h FROM span),
       |obs AS (SELECT ld - fd AS t,
       |    CASE WHEN ld + $gapDays <= (SELECT h FROM hz)
       |      THEN 1 ELSE 0 END AS death
       |  FROM span),
       |census AS (SELECT t, CAST(SUM(death) AS BIGINT) AS n_death,
       |    CAST(SUM(1 - death) AS BIGINT) AS n_censor
       |  FROM obs GROUP BY 1),
       |risk AS (SELECT t, n_death, n_censor,
       |    CAST((SELECT SUM(n_death + n_censor) FROM census) AS BIGINT)
       |      - COALESCE(CAST(SUM(n_death + n_censor) OVER (ORDER BY t
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |        AS BIGINT), 0) AS n_risk
       |  FROM census),
       |rk AS (SELECT t, n_risk, n_death, n_censor,
       |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rn
       |  FROM risk),
       |km AS (
       |  SELECT t, n_risk, n_death, n_censor, rn,
       |      (1000000 * (n_risk - n_death)) // n_risk AS s_ppm
       |    FROM rk WHERE rn = 1
       |  UNION ALL
       |  SELECT rk.t, rk.n_risk, rk.n_death, rk.n_censor, rk.rn,
       |      (km.s_ppm * (rk.n_risk - rk.n_death)) // rk.n_risk
       |    FROM km JOIN rk ON rk.rn = km.rn + 1)
       |SELECT t, n_risk, n_death, n_censor, CAST(s_ppm AS BIGINT) AS s_ppm
       |FROM km ORDER BY t""".stripMargin
}
