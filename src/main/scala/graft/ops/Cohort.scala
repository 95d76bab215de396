package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention: bucket every key (user) into the cohort of its
  * FIRST event, then count how many distinct keys from each cohort
  * were active again `offset` buckets later — the classic retention
  * triangle. `bucket` is a fixed width in `tsCol`'s unit (e.g. weekly
  * = 7·86400·10⁹ for epoch-ns timestamps); cohort and offset stay
  * all-integer, so results are engine-exact.
  *
  * Floor-divides correctly for negative timestamps, and uses the
  * identity `min(ts) div B = min(ts div B)` (floor is monotone), so
  * the cohort can be computed from the bucketed column directly.
  *
  * 100 TB shape: one shuffle partitions events by key for the
  * first-event window; the (key, cohort, offset) projection is then
  * deduplicated and counted — Spark plans the `count(distinct key)`
  * as a two-phase partial/final aggregate, so no single reducer sees
  * a whole cohort's users. Per-key window state is one long.
  */
object Cohort {

  /** Returns `(cohort, offset, n_keys)`: distinct keys whose first
    * event fell in `cohort` (floored bucket index) and who had at
    * least one event `offset` buckets later (offset 0 = the cohort
    * bucket itself, so `offset = 0` rows equal cohort size).
    */
  def retention(
      df: DataFrame, keyCol: String, tsCol: String, bucket: Long,
  ): DataFrame = {
    require(bucket > 0, s"bucket $bucket must be positive")
    Seq("__b", "cohort", "offset", "n_keys").foreach(c =>
      require(!df.columns.contains(c),
        s"retention reserves column name $c; rename it in the input"))
    val b = expr(s"($tsCol div $bucket) + (case when $tsCol % $bucket < 0 then -1 else 0 end)")
    val w = Window.partitionBy(col(keyCol))
    df.withColumn("__b", b)
      .withColumn("cohort", min(col("__b")).over(w))
      .select(col(keyCol), col("cohort"), (col("__b") - col("cohort")).as("offset"))
      .groupBy(col("cohort"), col("offset"))
      .agg(countDistinct(col(keyCol)).as("n_keys"))
  }
}
