package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: turn a per-key
  * change log `(key, ts, value)` into validity intervals — one row
  * per RUN of equal consecutive values, `valid_from` = the run's
  * first timestamp, `valid_to` = the next run's start (null while
  * current). The warehouse-standard dimension-history shape, and the
  * same compression a feature store applies to slowly-moving user
  * attributes before an as-of join.
  *
  * Determinism: events order by `(tsCol, orderCol)` (unique per key);
  * consecutive duplicates compress via `lag`, interval ends via
  * `lead` — both over the SAME single per-key window frame, so the
  * whole build is one exchange + one sort, no self-join.
  *
  * 100 TB shape: one hash shuffle on the key; state per key is the
  * window frame's sort run, the sessionizer bound. Timestamps stay
  * in the caller's numeric unit (epoch-ns here) untouched.
  */
object Scd {

  /** `(keyCol, run_idx, valueCol, valid_from, valid_to)` —
    * run-compressed validity intervals per key, `valid_to` null on
    * the open run. `run_idx` (1-based per key, in event order) is the
    * DETERMINISTIC presentation key: `valid_from` alone is not unique
    * per key (two runs can start at equal timestamps under tie-broken
    * event order, and downstream truncation — e.g. ns → µs — can
    * collapse distinct starts), so any ordered dump must sort by
    * `(keyCol, run_idx)`, never by the timestamp.
    */
  def scd2(
      df: DataFrame, keyCol: String, tsCol: String, orderCol: String,
      valueCol: String,
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    val changes = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      // null-safe inequality: the key's first row always opens a run
      // (even a null value), and any transition to/from null does too
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(valueCol)))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    changes
      .withColumn("run_idx", row_number().over(w2).cast("int"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .select(col(keyCol), col("run_idx"), col(valueCol),
        col(tsCol).as("valid_from"), col("valid_to"))
  }
}
