package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row
  * with `rightOn <= leftOn` among matching `by` keys. Spark has no
  * built-in as-of join; the idiomatic distributed shape used here is
  * union + windowed last-value backfill:
  *
  *   1. tag both inputs and union them on a common schema,
  *   2. one shuffle partitioned by `by`, sorted by (time, side) —
  *      right rows sort before left rows at equal timestamps so ties
  *      are inclusive,
  *   3. `last(payload, ignoreNulls)` over an unbounded-preceding
  *      window carries each right payload forward to the left rows
  *      that follow it,
  *   4. keep the left rows.
  *
  * Cost: ONE shuffle of left+right on the key columns — no range
  * explosion, no cross product, and AQE handles skewed keys. This is
  * the plan a custom SparkPlan would produce, so no custom strategy is
  * needed (preference (a) of the build rules: compose built-ins).
  *
  * Right rows must be unique per (by, rightOn); pre-aggregate
  * (e.g. `max_by`) if they are not, or the carried payload is
  * nondeterministic.
  */
object AsOf {

  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      by: Seq[String],
      payload: Seq[String],
  ): DataFrame = {
    val leftExtras = left.columns.toSeq
      .filterNot(c => by.contains(c) || c == leftOn)
    val l = left.select(
      by.map(col) ++
        Seq(col(leftOn).as("_t"), lit(1).as("_side")) ++
        leftExtras.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      by.map(col) ++
        Seq(col(rightOn).as("_t"), lit(0).as("_side")) ++
        leftExtras.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // payload travels as ONE struct so every output column comes from
    // the SAME matched right row — per-column ignoreNulls backfill
    // would resurrect stale values when the matched row holds a NULL
    val packed = l.unionByName(r).select(
      (by.map(col) :+ col("_t") :+ col("_side")) ++
        leftExtras.map(col) :+
        when(col("_side") === 0, struct(payload.map(col): _*)).as("_p"): _*)

    val filled = packed.select(
      (by.map(col) :+ col("_t") :+ col("_side")) ++
        leftExtras.map(col) :+
        last(col("_p"), ignoreNulls = true).over(w).as("_p"): _*)

    filled.filter(col("_side") === 1)
      .select(by.map(col) ++ Seq(col("_t").as(leftOn)) ++
        leftExtras.map(col) ++ payload.map(c => col("_p").getField(c).as(c)): _*)
  }
}
