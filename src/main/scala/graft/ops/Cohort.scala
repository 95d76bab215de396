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

  /** Lifecycle-stage counts per bucket — the growth-accounting view
    * (new / retained / resurrected / churned) every activity
    * dashboard derives from the same activity grid as [[retention]]:
    * per active (key, bucket), the key is `new` on its first bucket,
    * `retained` when also active the previous bucket, `resurrected`
    * when returning after a gap; and each active bucket whose NEXT
    * activity is not the immediately following bucket contributes one
    * `churned` at `bucket + 1` (including the key's last observed
    * bucket — the standard convention that makes the identity
    * `active(b) = new + retained + resurrected` and
    * `churned(b+1) = active(b) − retained(b+1)` hold).
    *
    * All-integer bucket arithmetic; deterministic. One distinct
    * shuffle builds the (key, bucket) activity grid, one per-key
    * window computes prev/next, the stage rows explode map-side and
    * aggregate on (bucket, stage).
    */
  def lifecycle(
      df: DataFrame, keyCol: String, tsCol: String, bucket: Long,
  ): DataFrame = {
    require(bucket > 0, s"bucket $bucket must be positive")
    Seq("__b", "__prev", "__next", "stage", "n_keys").foreach(c =>
      require(!df.columns.contains(c),
        s"lifecycle reserves column name $c; rename it in the input"))
    val b = expr(s"($tsCol div $bucket) + (case when $tsCol % $bucket < 0 then -1 else 0 end)")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__b"))
    val grid = df.withColumn("__b", b)
      .select(col(keyCol), col("__b")).distinct()
      .withColumn("__prev", lag(col("__b"), 1).over(w))
      .withColumn("__next", lead(col("__b"), 1).over(w))
    grid
      .select(explode(array(
        struct(col("__b").as("bucket"),
          when(col("__prev").isNull, lit("new"))
            .when(col("__prev") === col("__b") - 1, lit("retained"))
            .otherwise(lit("resurrected")).as("stage")),
        struct((col("__b") + 1).as("bucket"),
          when(col("__next").isNull || col("__next") > col("__b") + 1,
            lit("churned")).as("stage"))))
        .as("s"))
      .filter(col("s.stage").isNotNull)
      .groupBy(col("s.bucket").as("bucket"), col("s.stage").as("stage"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** DuckDB rendering of [[lifecycle]] over the `events` table
    * (weekly buckets by default, epoch-ns).
    */
  def lifecycleSql(whereClause: String, bucket: Long): String =
    s"""WITH g AS (SELECT DISTINCT user_id,
       |    epoch_ns(ts) // $bucket AS b
       |  FROM events $whereClause),
       |x AS (SELECT user_id, b,
       |    lag(b) OVER w AS prev, lead(b) OVER w AS next
       |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY b)),
       |st AS (
       |  SELECT b AS bucket,
       |    CASE WHEN prev IS NULL THEN 'new'
       |         WHEN prev = b - 1 THEN 'retained'
       |         ELSE 'resurrected' END AS stage
       |  FROM x
       |  UNION ALL
       |  SELECT b + 1, 'churned' FROM x
       |  WHERE next IS NULL OR next > b + 1)
       |SELECT bucket, stage, CAST(count(*) AS BIGINT) AS n_keys
       |FROM st GROUP BY bucket, stage
       |ORDER BY bucket, stage""".stripMargin
}
