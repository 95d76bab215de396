package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins (backward and forward) — for each left row, the most
  * recent right row with `rightOn <= leftOn` (backward) or the
  * earliest with `rightOn >= leftOn` (forward) among matching `by`
  * keys. Spark has no built-in as-of join; the idiomatic distributed
  * shape used here is union + windowed value carry (backward shown):
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
  *
  * `tolerance` (pandas `merge_asof`-style) bounds the match gap: a
  * carried right row farther than `tolerance` time units from the
  * left row yields NULL payload instead — the nearest candidate is
  * already the closest possible, so "nearest within tolerance" and
  * "nearest, then tolerance-filtered" coincide. Requires an INTEGRAL
  * time column (epoch units); convert timestamps upstream.
  */
object AsOf {

  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      by: Seq[String],
      payload: Seq[String],
      tolerance: Option[Long] = None,
  ): DataFrame =
    asofCore(left, right, leftOn, rightOn, by, payload, backward = true,
      tolerance)

  /** Forward as-of join — for each left row, the EARLIEST right row
    * with `rightOn >= leftOn` among matching `by` keys (ties
    * inclusive): "the next event at or after this timestamp". The
    * exact mirror of [[asofJoinBackward]] — same union + one-shuffle
    * window plan, with the carry running backward (`first` over an
    * unbounded-following frame) instead of forward.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      by: Seq[String],
      payload: Seq[String],
      tolerance: Option[Long] = None,
  ): DataFrame =
    asofCore(left, right, leftOn, rightOn, by, payload, backward = false,
      tolerance)

  private def asofCore(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      by: Seq[String],
      payload: Seq[String],
      backward: Boolean,
      tolerance: Option[Long] = None,
  ): DataFrame = {
    tolerance.foreach { tol =>
      require(tol >= 0, s"tolerance $tol must be >= 0")
      val ok = left.schema(leftOn).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType => true
        case _ => false
      }
      require(ok, "tolerance requires an integral (epoch-unit) time " +
        s"column; $leftOn is ${left.schema(leftOn).dataType.sql} — " +
        "convert upstream")
    }
    val leftExtras = left.columns.toSeq
      .filterNot(c => by.contains(c) || c == leftOn)
    // side ordering makes ties inclusive in BOTH directions: backward
    // sorts right rows before left at equal t (the preceding-frame
    // `last` sees them); forward sorts them after (the following-frame
    // `first` sees them)
    val (leftSide, rightSide) = if (backward) (1, 0) else (0, 1)
    val l = left.select(
      by.map(col) ++
        Seq(col(leftOn).as("_t"), lit(leftSide).as("_side")) ++
        leftExtras.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      by.map(col) ++
        Seq(col(rightOn).as("_t"), lit(rightSide).as("_side")) ++
        leftExtras.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)

    val base = Window.partitionBy(by.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
    val w =
      if (backward) base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // payload travels as ONE struct so every output column comes from
    // the SAME matched right row — per-column ignoreNulls backfill
    // would resurrect stale values when the matched row holds a NULL
    val packedFields =
      if (tolerance.isDefined) payload.map(col) :+ col("_t").as("__rt")
      else payload.map(col)
    val packed = l.unionByName(r).select(
      (by.map(col) :+ col("_t") :+ col("_side")) ++
        leftExtras.map(col) :+
        when(col("_side") === lit(rightSide), struct(packedFields: _*)).as("_p"): _*)

    val carry =
      if (backward) last(col("_p"), ignoreNulls = true)
      else first(col("_p"), ignoreNulls = true)
    val filled = packed.select(
      (by.map(col) :+ col("_t") :+ col("_side")) ++
        leftExtras.map(col) :+
        carry.over(w).as("_p"): _*)

    // a match farther than the tolerance nulls out: the carried row is
    // the NEAREST candidate, so nothing closer exists (null _p stays
    // null — `when` without otherwise)
    val guarded = tolerance match {
      case None => col("_p")
      case Some(tol) =>
        val gap =
          if (backward) col("_t") - col("_p").getField("__rt")
          else col("_p").getField("__rt") - col("_t")
        when(gap <= lit(tol), col("_p"))
    }
    filled.filter(col("_side") === lit(leftSide))
      .select(by.map(col) ++ Seq(col("_t").as(leftOn)) ++
        leftExtras.map(col) ++
        payload.map(c => guarded.getField(c).as(c)): _*)
  }
}
