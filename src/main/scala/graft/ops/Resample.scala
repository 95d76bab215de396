package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: quantize events onto a fixed-step per-key
  * grid, FILL THE GAPS (a bucket with no events still gets a row), and
  * forward-fill the last observed value across empty buckets — the
  * standard feature-store densification step (hourly activity series,
  * sensor readings carried forward) that SQL engines express with
  * `generate_series` + `LAST_VALUE IGNORE NULLS`.
  *
  * Timestamps are NUMERIC (epoch ns longs for the `events` table);
  * `step` is in the same unit. Bucketing floors correctly for negative
  * timestamps (floorDiv, not truncation).
  *
  * Determinism: the per-bucket carried value is `max_by(value,
  * (ts, order))` — the bucket's LAST event by timestamp with `orderCol`
  * breaking ties — so results are engine-exact and independent of
  * partitioning. The fill itself is `last(_, ignoreNulls)` over an
  * unbounded-preceding ROWS frame on the grid.
  *
  * 100 TB shape: one shuffle aggregates events per (key, bucket); the
  * grid explodes from each key's (min, max) bucket SPAN — a per-key
  * 2-long row, never the raw events — and joins back on (key, bucket);
  * the fill is one more window over the key. Grid size is bounded by
  * `maxBucketsPerKey` (default 1,000,000; 0 = off): a key whose span
  * would explode into more grid rows than that fails fast with the
  * offending span in the error instead of silently materializing a
  * billion-row grid (the guard lives in the explode's own upper bound,
  * so Catalyst cannot prune it).
  */
object Resample {

  /** Returns `(keyCol, bucket, n_events, last_val)`: one row per key
    * per `step`-wide bucket between that key's first and last event
    * (inclusive), `n_events` = 0 on gap rows, `last_val` = the bucket's
    * last value by `(tsCol, orderCol)` forward-filled across gaps.
    * `bucket` is the floored quotient `tsCol / step` (multiply back by
    * `step` for the bucket's start timestamp).
    */
  def resample(
      df: DataFrame, keyCol: String, tsCol: String, orderCol: String,
      valueCol: String, step: Long,
      maxBucketsPerKey: Long = 1000000L,
  ): DataFrame = {
    require(step > 0, s"step $step must be positive")
    require(maxBucketsPerKey >= 0,
      s"maxBucketsPerKey $maxBucketsPerKey must be >= 0 (0 disables)")
    Seq("__bucket", "__in_bucket", "__lo", "__hi", "bucket", "n_events", "last_val")
      .foreach(c => require(!df.columns.contains(c),
        s"resample reserves column name $c; rename it in the input"))

    val bucketExpr =
      expr(s"($tsCol div $step) + (case when $tsCol % $step < 0 then -1 else 0 end)")
    val perBucket = df.withColumn("__bucket", bucketExpr)
      .groupBy(col(keyCol), col("__bucket"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col(valueCol), struct(col(tsCol), col(orderCol))).as("__in_bucket"))

    val span = perBucket.groupBy(col(keyCol))
      .agg(min(col("__bucket")).as("__lo"), max(col("__bucket")).as("__hi"))
    val nBuckets = col("__hi") - col("__lo") + lit(1L)
    val hiGuarded =
      if (maxBucketsPerKey > 0)
        when(nBuckets > lit(maxBucketsPerKey),
          raise_error(concat(
            lit(s"resample: key spans more than $maxBucketsPerKey buckets " +
              "(widen step or raise maxBucketsPerKey): key="),
            col(keyCol).cast("string"),
            lit(" span="), nBuckets.cast("string"))).cast("long"))
          .otherwise(col("__hi"))
      else col("__hi")
    val grid = span
      .withColumn("__bucket", explode(sequence(col("__lo"), hiGuarded)))
      .select(col(keyCol), col("__bucket"))

    val w = Window.partitionBy(col(keyCol)).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq(keyCol, "__bucket"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("last_val", last(col("__in_bucket"), ignoreNulls = true).over(w))
      .drop("__in_bucket")
      .withColumnRenamed("__bucket", "bucket")
  }
}
