package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: consecutive events of the same key
  * belong to one session while the gap between them stays within
  * `gap`; a longer silence starts a new session. The batch twin of
  * [[graft.streaming.Streams]]' session windows — identical semantics,
  * but over a closed historical table where watermarks don't apply and
  * the whole history of a key is visible at once.
  *
  * Timestamps are NUMERIC (epoch ns for the `events` table, read via
  * `nanosAsLong`): session arithmetic stays in integers end to end, so
  * results are engine-exact for the oracle and immune to timestamp
  * rounding. `gap` is in the same unit as `tsCol`.
  *
  * 100 TB shape: one shuffle, partitioned by the session key — the
  * classic window-function plan. Both window phases (the `lag` gap
  * test and the running sum that numbers sessions) share the single
  * `(key) PARTITION BY / (ts, order) ORDER BY` sort, so Spark plans
  * them over one exchange. Per-reducer state is one key's event
  * history; a pathologically hot key (one user with billions of
  * events) is the known limit of any sessionization — cap upstream or
  * pre-split by time range if a key can exceed executor memory.
  * `orderCol` breaks timestamp ties deterministically (required for a
  * stable numbering when two events of a key share a timestamp).
  */
object Sessions {

  /** Event-level sessionization: input rows plus `session_seq` —
    * the 1-based session number within each `keyCol` value.
    */
  def sessionize(
      df: DataFrame, keyCol: String, tsCol: String, orderCol: String,
      gap: Long,
  ): DataFrame = {
    require(gap > 0, s"gap $gap must be positive")
    Seq("__prev_ts", "session_seq").foreach(c =>
      require(!df.columns.contains(c),
        s"sessionize reserves column name $c; rename it in the input"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsCol) - prev > lit(gap), 1L)
      .otherwise(0L)
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session-level summary: `(keyCol, session_seq, n_events, start_ts,
    * end_ts)` with one row per session, timestamps in `tsCol`'s unit.
    */
  def sessionSummary(
      df: DataFrame, keyCol: String, tsCol: String, orderCol: String,
      gap: Long,
  ): DataFrame =
    sessionize(df, keyCol, tsCol, orderCol, gap)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))

  /** Trailing event-time window features: every row plus `n_trailing`
    * (events of the same key in `[ts − trailing, ts]` — both ends
    * INCLUSIVE, the RANGE-frame contract: an event exactly `trailing`
    * old still counts) and, when
    * `valueCol` is set, `max_trailing` (max of that column over the
    * same frame) — the rate/recency features a training pipeline
    * derives per event (requests-in-last-hour, peak-value-in-window).
    *
    * The frame is RANGE-based on the numeric `tsCol`, so rows with
    * equal timestamps all see each other — the result is deterministic
    * for any partitioning with no tie-break column needed. Only
    * order-insensitive aggregates are exposed (count, max): a trailing
    * SUM of doubles would depend on intra-frame evaluation order and
    * break engine-exactness (sum integers upstream if you need it).
    *
    * 100 TB shape: identical to [[sessionize]] — one shuffle on the
    * key, one sort per partition, both features share the single
    * window frame. Per-reducer state is the trailing window of one
    * key, bounded by `trailing`, not history length.
    */
  /** First event per key per tumbling `window` — the batch twin of
    * streaming `dropDuplicatesWithinWatermark`: bounded-lookback dedup
    * / rate limiting ("at most one alert per user per 6 h", "first
    * click per session window"). Returns the winning input rows with
    * their window index (`bucket` = floored `tsCol / window`); the
    * winner is the minimum `(tsCol, orderCol)` of the window, so the
    * result is deterministic under ties and partitioning.
    *
    * 100 TB shape: ONE hash shuffle on (key, bucket) with map-side
    * combine via `min_by` — no window sort at all (compare
    * [[sessionize]], which must sort). State per reducer is one row
    * per (key, bucket).
    */
  def firstPerWindow(
      df: DataFrame, keyCol: String, tsCol: String, orderCol: String,
      window: Long,
  ): DataFrame = {
    require(window > 0, s"window $window must be positive")
    Seq("__bucket", "__w", "bucket").foreach(c =>
      require(!df.columns.contains(c),
        s"firstPerWindow reserves column name $c; rename it in the input"))
    val b = expr(
      s"($tsCol div $window) + (case when $tsCol % $window < 0 then -1 else 0 end)")
    df.withColumn("__bucket", b)
      .groupBy(col(keyCol), col("__bucket"))
      .agg(min_by(struct(df.columns.map(col): _*),
        struct(col(tsCol), col(orderCol))).as("__w"))
      .select(col("__bucket").as("bucket"), col("__w.*"))
  }

  def trailingStats(
      df: DataFrame, keyCol: String, tsCol: String, trailing: Long,
      valueCol: Option[String] = None,
  ): DataFrame = {
    require(trailing > 0, s"trailing $trailing must be positive")
    Seq("n_trailing", "max_trailing").foreach(c =>
      require(!df.columns.contains(c),
        s"trailingStats reserves column name $c; rename it in the input"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rangeBetween(-trailing, 0)
    val base = df.withColumn("n_trailing", count(lit(1)).over(w))
    valueCol.fold(base)(v =>
      base.withColumn("max_trailing", max(col(v)).over(w)))
  }
}
