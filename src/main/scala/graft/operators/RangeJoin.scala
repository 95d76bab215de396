package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval–point range join: pair every point with every interval
  * `[lo, hi]` (both ends INCLUSIVE) that contains it, optionally under
  * extra equality keys. The operator the reference exposes as a range
  * predicate join (and DuckDB plans with its IEJoin); Spark has no
  * native range-join operator — a raw `a.join(b, p >= lo && p <= hi)`
  * without an equality key plans as BroadcastNestedLoopJoin (fine only
  * when one side broadcasts) or a full cartesian.
  *
  * Strategy here is the standard binning decomposition: quantize the
  * range dimension into fixed-width bins, explode each interval into
  * the bins it covers, tag each point with its single bin, then
  * EQUI-join on `(bin, keys…)` and re-check the exact predicate. Each
  * point lands in exactly one bin, so a (point, interval) pair can
  * meet in at most one bin — the join emits NO duplicates and needs no
  * post-dedup.
  *
  * 100 TB shape: the cartesian becomes a shuffled equi-join on the bin
  * key; both sides partition by `(bin, keys…)`, so work distributes
  * across the cluster and AQE's skew-join split applies to hot bins.
  * Candidate volume = Σ_intervals (span/binWidth + 1) interval copies:
  * pick `binWidth` near the MEDIAN interval span — too small explodes
  * interval replicas, too large widens each bin's candidate set. The
  * `maxBinsPerInterval` guard (default 65536, 0 = off) fails fast when
  * one degenerate interval would replicate into millions of rows
  * (span/binWidth ≫ expected) instead of silently materializing them.
  *
  * All range columns are numeric (use epoch ns longs for time); the
  * caller picks the unit, `binWidth` is in the same unit.
  */
object RangeJoin {

  /** Inner pair join: one output row per (point row, interval row)
    * with `loCol <= pointCol <= hiCol` and all `keys` equal
    * (`pointKey === intervalKey`). Column sets of the two inputs must
    * be disjoint (standard join hygiene; rename upstream).
    *
    * Intervals with `hi < lo` are empty by definition and dropped.
    */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Long,
      keys: Seq[(String, String)] = Nil,
      maxBinsPerInterval: Long = 65536L,
  ): DataFrame = {
    require(binWidth > 0, s"binWidth $binWidth must be positive")
    require(maxBinsPerInterval >= 0,
      s"maxBinsPerInterval $maxBinsPerInterval must be >= 0 (0 disables)")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty,
      s"points/intervals share column names $overlap; rename upstream")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "rangeJoin reserves column name __bin; rename it in the input")

    // floorDiv in integer arithmetic: `div` truncates toward zero, so
    // a negative value with a nonzero remainder must step one bin down
    // or negative range values map into the wrong bin. All-integer on
    // purpose — double division loses ulps at ns-epoch magnitudes.
    def binExpr(c: String) =
      expr(s"($c div $binWidth) + (case when $c % $binWidth < 0 then -1 else 0 end)")
    val loBin = binExpr(loCol)
    val hiBin = binExpr(hiCol)
    val pBin = binExpr(pointCol)

    // the guard is folded into the explode's own upper bound — a
    // side-channel guard column would be pruned away by Catalyst as
    // unused, and the error must fire BEFORE the replicas materialize.
    // Span compared WITHOUT the +1 of nBins = hiBin-loBin+1, in TRY
    // mode (a plain subtraction on a Long.MaxValue sentinel bound
    // throws a generic ARITHMETIC_OVERFLOW under ansi or wraps
    // negative under legacy): a null or negative span — impossible
    // for hi >= lo — raises the guard's actionable message instead of
    // bypassing it and failing later inside sequence()
    val span = try_subtract(hiBin, loBin)
    val hiBinGuarded =
      if (maxBinsPerInterval > 0)
        when(span.isNull || span >= lit(maxBinsPerInterval) || span < lit(0L),
          raise_error(concat(
            lit(s"rangeJoin: interval spans more than $maxBinsPerInterval bins " +
              "(widen binWidth or raise maxBinsPerInterval): lo="),
            col(loCol).cast("string"), lit(" hi="), col(hiCol).cast("string")))
            .cast("long"))
          .otherwise(hiBin)
      else hiBin
    val binnedIntervals = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__bin", explode(sequence(loBin, hiBinGuarded)))
    val binnedPoints = points.withColumn("__bin", pBin)

    val joinCond = keys.foldLeft(
      binnedPoints("__bin") === binnedIntervals("__bin") &&
        binnedPoints(pointCol) >= binnedIntervals(loCol) &&
        binnedPoints(pointCol) <= binnedIntervals(hiCol)) {
      case (c, (pk, ik)) => c && binnedPoints(pk) === binnedIntervals(ik)
    }
    binnedPoints.join(binnedIntervals, joinCond)
      .drop("__bin")
  }

  /** Interval–interval OVERLAP join: one output row per (left, right)
    * pair with `[lLo,lHi] ∩ [rLo,rHi] ≠ ∅` (inclusive ends:
    * `lLo <= rHi && rLo <= lHi`) and all `keys` equal.
    *
    * Same binning decomposition, but since BOTH sides replicate across
    * bins an overlapping pair now meets in every shared bin — the
    * standard fix assigns each pair to ONE canonical meeting bin, the
    * bin of `max(lLo, rLo)` (the overlap's start, which both sides
    * always cover), and filters the other meetings out. No post-dedup
    * shuffle: the filter is a per-row comparison.
    *
    * Scale shape matches [[rangeJoin]]; candidate volume is
    * Σ spans/binWidth over BOTH sides, so size `binWidth` near the
    * median span of the DENSER side. `maxBinsPerInterval` guards both.
    */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      binWidth: Long,
      keys: Seq[(String, String)] = Nil,
      maxBinsPerInterval: Long = 65536L,
  ): DataFrame = {
    require(binWidth > 0, s"binWidth $binWidth must be positive")
    val overlapCols = left.columns.toSet intersect right.columns.toSet
    require(overlapCols.isEmpty,
      s"left/right share column names $overlapCols; rename upstream")
    Seq(left, right).foreach(df =>
      require(!df.columns.contains("__bin"),
        "intervalOverlapJoin reserves column name __bin; rename it in the input"))

    def binned(df: DataFrame, lo: String, hi: String) = {
      def binExpr(c: String) =
        expr(s"($c div $binWidth) + (case when $c % $binWidth < 0 then -1 else 0 end)")
      // overflow-safe span check — see rangeJoin's guard for why the
      // +1 is dropped and a null/negative (overflowed) span also raises
      val span = try_subtract(binExpr(hi), binExpr(lo))
      val hiG =
        if (maxBinsPerInterval > 0)
          when(span.isNull || span >= lit(maxBinsPerInterval) || span < lit(0L),
            raise_error(concat(
              lit(s"intervalOverlapJoin: interval spans more than $maxBinsPerInterval bins " +
                "(widen binWidth or raise maxBinsPerInterval): lo="),
              col(lo).cast("string"), lit(" hi="), col(hi).cast("string")))
              .cast("long"))
            .otherwise(binExpr(hi))
        else binExpr(hi)
      df.filter(col(hi) >= col(lo))
        .withColumn("__bin", explode(sequence(binExpr(lo), hiG)))
    }

    val lB = binned(left, lLo, lHi)
    val rB = binned(right, rLo, rHi)
    // canonical meeting bin = floorDiv(max(lLo, rLo), binWidth) in
    // ALL-INTEGER arithmetic (a double floor loses ulps at ns-epoch
    // magnitudes); lLo/rLo are unambiguous names in the joined plan,
    // so a SQL expr resolves them across the join
    val meet = expr(
      s"(greatest($lLo, $rLo) div $binWidth) + " +
        s"(case when greatest($lLo, $rLo) % $binWidth < 0 then -1 else 0 end)")
    val joinCond = keys.foldLeft(
      lB("__bin") === rB("__bin") &&
        lB(lLo) <= rB(rHi) && rB(rLo) <= lB(lHi) &&
        lB("__bin") === meet) {
      case (c, (lk, rk)) => c && lB(lk) === rB(rk)
    }
    lB.join(rB, joinCond).drop("__bin")
  }
}
