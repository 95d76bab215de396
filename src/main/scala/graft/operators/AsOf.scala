package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins (backward, forward, and nearest) — for each left row,
  * the most recent right row with `rightOn <= leftOn` (backward), the
  * earliest with `rightOn >= leftOn` (forward), or the smallest-|gap|
  * row in either direction (nearest) among matching `by` keys. Spark has no built-in as-of join; the idiomatic distributed
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

  /** Nearest as-of join — for each left row, the right row with the
    * smallest |gap| among matching `by` keys, in EITHER direction
    * (pandas `merge_asof(direction='nearest')`); an exact tie between
    * the preceding and following candidate resolves to the PRECEDING
    * one (deterministic, documented — the backward match is the one a
    * pure-backward join would have produced). Requires an INTEGRAL
    * (epoch-unit) time column — the gap comparison is integer
    * arithmetic; convert timestamps upstream.
    *
    * Same one-shuffle plan as the directional joins: both the
    * backward (`last` over preceding) and forward (`first` over
    * following) carries run over the SAME partitioning and sort, so
    * Catalyst plans ONE exchange and one sort for the pair
    * (AsOfSpec pins the single exchange). Right rows sort before
    * left rows at equal timestamps: the backward carry sees gap-0
    * matches, and the forward carry missing them is harmless — gap 0
    * always wins the nearest comparison.
    *
    * `tolerance` bounds the |gap| exactly as in the directional
    * forms: the nearest candidate is the closest possible, so
    * "nearest within tolerance" and "nearest, then filtered"
    * coincide.
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      by: Seq[String],
      payload: Seq[String],
      tolerance: Option[Long] = None,
  ): DataFrame = {
    val integral = left.schema(leftOn).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    require(integral, "nearest requires an integral (epoch-unit) time " +
      s"column; $leftOn is ${left.schema(leftOn).dataType.sql} — " +
      "convert upstream")
    tolerance.foreach(tol => require(tol >= 0, s"tolerance $tol must be >= 0"))
    val leftExtras = left.columns.toSeq
      .filterNot(c => by.contains(c) || c == leftOn)
    val (rightSide, leftSide) = (0, 1)
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
    val wB = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val packedFields = payload.map(col) :+ col("_t").as("__rt")
    val packed = l.unionByName(r).select(
      (by.map(col) :+ col("_t") :+ col("_side")) ++
        leftExtras.map(col) :+
        when(col("_side") === lit(rightSide), struct(packedFields: _*)).as("_p"): _*)
    val filled = packed.select(
      (by.map(col) :+ col("_t") :+ col("_side")) ++
        leftExtras.map(col) :+
        last(col("_p"), ignoreNulls = true).over(wB).as("_pb") :+
        first(col("_p"), ignoreNulls = true).over(wF).as("_pf"): _*)

    val gapB = col("_t") - col("_pb").getField("__rt")
    val gapF = col("_pf").getField("__rt") - col("_t")
    val nearest =
      when(col("_pb").isNull, col("_pf"))
        .when(col("_pf").isNull, col("_pb"))
        .when(gapB <= gapF, col("_pb"))
        .otherwise(col("_pf"))
    val guarded = tolerance match {
      case None => nearest
      case Some(tol) =>
        when(abs(nearest.getField("__rt") - col("_t")) <= lit(tol), nearest)
    }
    filled.filter(col("_side") === lit(leftSide))
      .select(by.map(col) ++ Seq(col("_t").as(leftOn)) ++
        leftExtras.map(col) ++
        payload.map(c => guarded.getField(c).as(c)): _*)
  }

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
      // the tolerance path packs the matched right timestamp into the
      // payload struct under this name; a real payload column named
      // __rt would produce a duplicate struct field and ambiguous
      // getField reads (same reserved-name contract as Winnow/Chunking)
      require(!payload.contains("__rt"),
        "payload column name '__rt' is reserved by the tolerance path — rename it upstream")
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
