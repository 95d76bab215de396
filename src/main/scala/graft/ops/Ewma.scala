package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average per key — the classic
  * smoothed-activity / trend feature (`pandas.Series.ewm(alpha).mean()`
  * with `adjust=False`): seeded at the key's first observation, then
  * `e_n = alpha * x_n + (1 - alpha) * e_{n-1}` in strict event order.
  *
  * Determinism: the recurrence is an ORDERED left fold, so the result
  * depends on evaluation order — both engines must execute the exact
  * same IEEE operation sequence. Here the fold runs over
  * `array_sort(collect_list(struct(ts, order, value)))` via the
  * codegen'd `aggregate` higher-order function: per element exactly
  * `alpha * x` (mul), `(1-alpha) * acc` (mul), `+` (add) — the same
  * three correctly-rounded ops the oracle's recursive CTE performs,
  * giving bit-identical doubles with NO quantization. `(tsCol,
  * orderCol)` must be unique per key (event_id tie-break), else the
  * sort — and therefore the fold — is not well-defined.
  *
  * The closed form `e_n = (1-a)^(n-1) x_1 + a * sum (1-a)^(n-i) x_i`
  * is deliberately NOT used: `pow` is not correctly-rounded and its
  * result differs across libm implementations; the fold is the only
  * engine-exact formulation.
  *
  * 100 TB shape: ONE hash shuffle (groupBy key); state is the key's
  * event list, bounded by per-key activity — the same bound every
  * sessionizer in this library carries. Keys with millions of events
  * should pre-aggregate onto a coarser grid first ([[Resample]]) or
  * use the streaming twin (one running double per key, O(1) state).
  * The fold itself is a map-side pass over the sorted array inside
  * whole-stage codegen — no window exchange, no per-row shuffle.
  */
object Ewma {

  /** `(keyCol, n_events, last_val, ewma)`: one row per key; `ewma` is
    * the recurrence folded over the key's events ordered by `(tsCol,
    * orderCol)`, seeded at the first value; `last_val` the final raw
    * observation (the un-smoothed twin, for drift-vs-smoothed deltas).
    */
  def ewma(
      df: DataFrame, keyCol: String, tsCol: String, orderCol: String,
      valueCol: String, alpha: Double,
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha must be in (0, 1]")
    val arr = array_sort(collect_list(
      struct(col(tsCol).as("t"), col(orderCol).as("o"),
        col(valueCol).cast("double").as("v"))))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), arr.as("__arr"))
      .select(col(keyCol), col("n_events"),
        element_at(col("__arr"), -1).getField("v").as("last_val"),
        aggregate(
          slice(col("__arr"), lit(2), greatest(size(col("__arr")) - 1, lit(0))),
          element_at(col("__arr"), 1).getField("v"),
          (acc: Column, x: Column) =>
            lit(alpha) * x.getField("v") + lit(1.0 - alpha) * acc)
          .as("ewma"))
  }

  /** DuckDB rendering of [[ewma]] over the `events` table: the same
    * recurrence as a recursive CTE stepping `rn -> rn + 1` per key —
    * one iteration per event RANK (all keys advance together), so
    * depth = the maximum per-key event count. Literals are rendered
    * with `Double.toString` (shortest round-trip repr), which both
    * engines parse to the identical double.
    */
  def ewmaSql(alpha: Double, whereClause: String): String =
    s"""WITH RECURSIVE e AS (
       |  SELECT user_id, value,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_ns(ts), event_id) AS rn
       |  FROM events $whereClause),
       |r(user_id, rn, ewma) AS (
       |  SELECT user_id, 1, value FROM e WHERE rn = 1
       |  UNION ALL
       |  SELECT e.user_id, e.rn, $alpha * e.value + ${1.0 - alpha} * r.ewma
       |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1),
       |n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  arg_max(value, rn) AS last_val, max(rn) AS m
       |  FROM e GROUP BY user_id)
       |SELECT n.user_id, n.n_events, n.last_val, r.ewma
       |FROM n JOIN r ON r.user_id = n.user_id AND r.rn = n.m
       |ORDER BY n.user_id""".stripMargin

  /** Holt double-exponential smoothing per key — [[ewma]] plus an
    * additive TREND component, the forecasting primitive behind
    * activity projections ("where is this user/domain heading next
    * period"): `l_n = α·x_n + (1-α)·(l_{n-1} + b_{n-1})`,
    * `b_n = β·(l_n - l_{n-1}) + (1-β)·b_{n-1}`, seeded at
    * `l_1 = x_1, b_1 = 0` (the zero-trend seed keeps single-event
    * keys well-defined; the `x_2 - x_1` seed variant converges to
    * the same fixed point and is one line away). The one-step
    * forecast is `l_n + b_n`.
    *
    * Same determinism stance as [[ewma]]: the fold executes the
    * identical IEEE operation sequence on both engines (each step:
    * `l + b`, scale, `α·x`, add; then `l' − l`, two scales, add —
    * the level expression appears twice in the trend update and is
    * re-evaluated identically by both engines), so raw doubles hash
    * with no quantization. Same 100 TB shape: one keyed shuffle,
    * per-key sorted-array fold in codegen, no window exchange.
    *
    * Output: `(keyCol, n_events, level, trend, forecast1)`.
    */
  def holt(
      df: DataFrame, keyCol: String, tsCol: String, orderCol: String,
      valueCol: String, alpha: Double, beta: Double,
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha must be in (0, 1]")
    require(beta >= 0.0 && beta <= 1.0, s"beta $beta must be in [0, 1]")
    val arr = array_sort(collect_list(
      struct(col(tsCol).as("t"), col(orderCol).as("o"),
        col(valueCol).cast("double").as("v"))))
    def step(acc: Column, x: Column): Column = {
      val l1 = lit(alpha) * x.getField("v") +
        lit(1.0 - alpha) * (acc.getField("l") + acc.getField("b"))
      struct(l1.as("l"),
        (lit(beta) * (l1 - acc.getField("l")) +
          lit(1.0 - beta) * acc.getField("b")).as("b"))
    }
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), arr.as("__arr"))
      .select(col(keyCol), col("n_events"),
        aggregate(
          slice(col("__arr"), lit(2), greatest(size(col("__arr")) - 1, lit(0))),
          struct(element_at(col("__arr"), 1).getField("v").as("l"),
            lit(0.0).as("b")),
          step).as("__hb"))
      .select(col(keyCol), col("n_events"),
        col("__hb.l").as("level"), col("__hb.b").as("trend"),
        (col("__hb.l") + col("__hb.b")).as("forecast1"))
  }

  /** DuckDB rendering of [[holt]] over the `events` table — the
    * [[ewmaSql]] recursive-CTE device carrying `(l, b)`; the level
    * expression is textually repeated inside the trend update, the
    * exact re-evaluation the Spark fold performs.
    */
  def holtSql(alpha: Double, beta: Double, whereClause: String): String = {
    val lNew = s"$alpha * e.value + ${1.0 - alpha} * (r.l + r.b)"
    s"""WITH RECURSIVE e AS (
       |  SELECT user_id, value,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_ns(ts), event_id) AS rn
       |  FROM events $whereClause),
       |r(user_id, rn, l, b) AS (
       |  SELECT user_id, 1, value, CAST(0 AS DOUBLE) FROM e WHERE rn = 1
       |  UNION ALL
       |  SELECT e.user_id, e.rn, $lNew,
       |    $beta * (($lNew) - r.l) + ${1.0 - beta} * r.b
       |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1),
       |n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  max(rn) AS m FROM e GROUP BY user_id)
       |SELECT n.user_id, n.n_events, r.l AS level, r.b AS trend,
       |  r.l + r.b AS forecast1
       |FROM n JOIN r ON r.user_id = n.user_id AND r.rn = n.m
       |ORDER BY n.user_id""".stripMargin
  }
}
