package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: for each key (user), the earliest time it
  * completed step 1, then the earliest STRICTLY-LATER time it
  * completed step 2, and so on — the greedy earliest-first semantics
  * every product-analytics engine implements (a later step-1 event is
  * never reconsidered, even if anchoring there would complete more
  * steps). Ties between consecutive steps at the same timestamp do NOT
  * advance the funnel: step ordering is strict (`>`), because
  * same-timestamp events have no defined order.
  *
  * 100 TB shape: one shuffle on the key, then k chained
  * whole-partition window minimums — consecutive Window operators over
  * the SAME partitioning plan over one exchange, no joins and no
  * per-user collect. The per-key state is one long per step. An
  * optional `maxSpan` caps conversion at `t_step − t_1 <= maxSpan`
  * (the "converted within 7 days" form), measured from the greedy
  * step-1 anchor.
  */
object Funnel {

  /** One row per key: `(keyCol, t_1 … t_k)` — epoch-unit completion
    * times of each funnel prefix, null from the first uncompleted step
    * on. `tsCol` must be numeric (epoch ns longs for `events`).
    */
  def funnelSteps(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], maxSpan: Long = 0L,
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct (repeated step names are ambiguous): $steps")
    require(maxSpan >= 0, s"maxSpan $maxSpan must be >= 0 (0 disables)")
    steps.indices.foreach(i =>
      require(!df.columns.contains(s"t_${i + 1}"),
        s"funnelSteps reserves column name t_${i + 1}; rename it in the input"))
    val w = Window.partitionBy(col(keyCol))
    val withTimes = steps.zipWithIndex.foldLeft(df) { case (acc, (step, i)) =>
      val within: Column =
        if (i == 0) lit(true)
        else if (maxSpan > 0)
          col(tsCol) > col(s"t_$i") && col(tsCol) - col("t_1") <= lit(maxSpan)
        else col(tsCol) > col(s"t_$i")
      acc.withColumn(s"t_${i + 1}",
        min(when(col(typeCol) === lit(step) && within, col(tsCol))).over(w))
    }
    // t_i is constant within a key; min() collapses to one row per key
    withTimes.groupBy(col(keyCol))
      .agg(min(col("t_1")).as("t_1"),
        steps.indices.drop(1).map(i => min(col(s"t_${i + 1}")).as(s"t_${i + 1}")): _*)
  }

  /** Funnel summary: `(step_idx, step, n_keys)` — how many keys
    * completed each prefix (non-increasing down the funnel).
    */
  def funnelSummary(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], maxSpan: Long = 0L,
  ): DataFrame = {
    val per = funnelSteps(df, keyCol, tsCol, typeCol, steps, maxSpan)
    val counts = per.agg(
      count(col("t_1")).as("c_1"),
      steps.indices.drop(1).map(i => count(col(s"t_${i + 1}")).as(s"c_${i + 1}")): _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"c_${i + 1}").as("n_keys"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
