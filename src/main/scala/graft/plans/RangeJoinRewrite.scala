package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, IntegerType, ShortType, ByteType}

/** Catalyst optimizer rule: rewrite naive NON-EQUI range joins with
  * no equality predicate — point-in-interval (`points JOIN intervals
  * ON p >= lo AND p <= hi`) and interval-overlap (`ON lLo <= rHi AND
  * rLo <= lHi`, the latter only when each side's plan constraints
  * PROVE `lo <= hi`) — into the binned equi-join decompositions of
  * [[graft.operators.RangeJoin]], directly on the logical plan. Without this, Spark plans such joins as
  * BroadcastNestedLoopJoin (only viable when one side broadcasts) or
  * a full cartesian; with it, users keep writing the natural
  * `df.join(iv, $"p" >= $"lo" && $"p" <= $"hi")` and the optimizer
  * substitutes the scalable plan:
  *
  *   - interval side gains `explode(sequence(bin(lo), bin(hi)))`
  *   - the join becomes an EQUI-join on the bin plus the original
  *     range predicate (each point meets an interval in exactly one
  *     bin, so no duplicates are introduced)
  *
  * OPT-IN via `spark.graft.rangeJoin.binWidth` (a positive long in
  * the range column's unit; unset = rule inert): bin width is a
  * data-dependent choice — near the median interval span — that only
  * the user can make. The rule matches STRICTLY: both bounds present
  * on one interval side, integral types, NO equality conjunct (if one
  * exists Spark already hash-joins on it), and a join type the
  * decomposition preserves — Inner in either orientation, plus
  * LeftOuter/RightOuter when the POINT side is the preserved side
  * (the exploded interval side is the nullable side, so an unmatched
  * point still emits exactly once; an outer-preserved INTERVAL side
  * would emit one null row per bin replica, so those pass through).
  * Everything else passes through untouched — but a join that LOOKS
  * range-shaped and still isn't rewritten logs a warning naming the
  * reason, because the fallback nested-loop plan is a 100× surprise
  * at scale. Registered by [[graft.GraftExtensions]] as
  * `injectOptimizerRule`.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan =
    spark.conf.getOption(confKey).map { raw =>
      // a clear error naming the key — a bare NumberFormatException
      // from inside the optimizer would fail every query in the
      // session with no hint where the bad value lives
      try raw.toLong
      catch {
        case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$confKey must be a positive long in the range column's " +
              s"unit, got '$raw'", e)
      }
    } match {
      case Some(bw) if bw > 0 =>
        plan.transform {
          case j @ Join(left, right, joinType, Some(cond), hint) =>
            rewrite(j, left, right, joinType, cond, bw, hint).getOrElse(j)
        }
      case _ => plan
    }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** floorDiv(c, bw) in pure integer Catalyst arithmetic. */
  private def binOf(c: Expression, bw: Long): Expression = {
    val cl = Cast(c, LongType)
    val lit = Literal(bw, LongType)
    Add(
      IntegralDivide(cl, lit),
      CaseWhen(Seq((LessThan(Remainder(cl, lit), Literal(0L, LongType)),
        Literal(-1L, LongType))), Literal(0L, LongType)))
  }

  /** The explode's upper bin, with the span guard folded in — see the
    * comments at the point-in-interval call site for why the span is
    * compared without a +1 and computed in TRY mode.
    */
  private def guardedHiBin(
      lo: Expression, hi: Expression, bw: Long, site: String): Expression = {
    val maxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"
    val maxBins = spark.conf.getOption(maxBinsKey).map { raw =>
      try raw.toLong
      catch {
        case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$maxBinsKey must be a long (0 disables the guard), " +
              s"got '$raw'", e)
      }
    }.getOrElse(65536L)
    val hiBin = binOf(hi, bw)
    if (maxBins <= 0) return hiBin
    val span = Subtract(binOf(hi, bw), binOf(lo, bw),
      NumericEvalContext(EvalMode.TRY))
    val spanBad = Or(Or(
      GreaterThanOrEqual(span, Literal(maxBins, LongType)),
      LessThan(span, Literal(0L, LongType))), IsNull(span))
    CaseWhen(Seq((spanBad,
      Cast(new RaiseError(Literal.create(
        s"$site: interval spans more than $maxBins bins " +
          "(widen spark.graft.rangeJoin.binWidth or raise " +
          s"$maxBinsKey)")),
        LongType))), hiBin)
  }

  /** `Filter(hi >= lo)` + `Generate(explode(sequence(bin(lo),
    * bin(hi))))` over `child` — one binned interval side.
    */
  private def binExplode(
      child: LogicalPlan, lo: Expression, hi: Expression, bw: Long,
      binAttr: AttributeReference, site: String): Generate = {
    val seq = new Sequence(binOf(lo, bw), guardedHiBin(lo, hi, bw, site),
      None, Some(spark.sessionState.conf.sessionLocalTimeZone))
    Generate(Explode(seq),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binAttr),
      child = Filter(GreaterThanOrEqual(hi, lo), child))
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan, joinType: JoinType,
      cond: Expression, bw: Long, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // any equality across the two sides -> Spark hash-joins already
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => referencesSplit(a, b, left, right).isDefined
      case EqualNullSafe(a, b) => referencesSplit(a, b, left, right).isDefined
      case _ => false
    }
    if (hasEqui) return None

    // find p >= lo and p <= hi with a consistent (point, interval)
    // split — typed later, so a range-shaped join that fails the
    // integral check can still be diagnosed
    val lowerBounds = conjuncts.collect {
      case GreaterThanOrEqual(p, lo) => (p, lo)
      case LessThanOrEqual(lo, p) => (p, lo)
    }
    val upperBounds = conjuncts.collect {
      case LessThanOrEqual(p, hi) => (p, hi)
      case GreaterThanOrEqual(hi, p) => (p, hi)
    }
    val shaped = for {
      (p1, lo) <- lowerBounds
      (p2, hi) <- upperBounds
      if p1.semanticEquals(p2)
      split <- referencesSplit(p1, lo, left, right)
      split2 <- referencesSplit(p1, hi, left, right)
      if split == split2
    } yield (p1, lo, hi, split)
    if (shaped.isEmpty) // not point-in-interval: try the overlap shape
      return rewriteOverlap(j, left, right, joinType, conjuncts, cond, bw, hint)
    val typed = shaped.filter { case (p, lo, hi, _) =>
      integral(p) && integral(lo) && integral(hi)
    }
    // the decomposition explodes the INTERVAL side, so that side must
    // be the nullable one in an outer join — the point side preserved
    val usable = joinType match {
      case Inner => typed.headOption
      case LeftOuter => typed.find(_._4)    // points on the left
      case RightOuter => typed.find(!_._4)  // points on the right
      case _ => None
    }
    if (usable.isEmpty) {
      val reason =
        if (typed.isEmpty)
          "the point/bound columns are not all integral types (bin the " +
            "values to long — e.g. epoch units — upstream)"
        else
          s"join type $joinType is not supported (Inner, or LeftOuter/" +
            "RightOuter with the point side preserved — an outer-" +
            "preserved interval side would emit one null row per bin " +
            "replica)"
      logWarning(
        s"RangeJoinRewrite: a $joinType join looks range-shaped (point " +
          s"BETWEEN lo AND hi) but was NOT rewritten because $reason; " +
          "the nested-loop/cartesian plan remains and will not scale.")
      return None
    }
    usable.map { case (p, lo, hi, pointOnLeft) =>
      val (pointPlan, intervalPlan0) = if (pointOnLeft) (left, right) else (right, left)
      // the guards the manual operator has, mirrored here:
      // (1) hi >= lo — an inverted interval would make sequence()
      //     count DOWN (step −1) and replicate instead of dropping
      //     (and for the POINT shape `p >= lo && p <= hi` with
      //     hi < lo is unsatisfiable, so the filter drops nothing
      //     the naive join would keep — exact equivalence holds);
      // (2) the explode's upper bound raises past maxBins — one
      //     degenerate interval (a Long.MaxValue sentinel timestamp)
      //     must fail fast, not materialize toward the array limit.
      //     The span check runs WITHOUT the +1 of nBins and in TRY
      //     mode (null on overflow under BOTH ansi settings; a plain
      //     Subtract would throw a generic ARITHMETIC_OVERFLOW under
      //     ansi, or wrap negative under legacy), and a null/negative
      //     span — impossible for hi >= lo — ALSO raises the guard's
      //     actionable message instead of bypassing it.
      // Sequence inside binExplode is TimeZoneAwareExpression: it is
      // UNRESOLVED until a timezone is attached, and analysis (which
      // normally attaches it) already ran — binExplode sets it
      // explicitly or the optimizer rejects the plan as unresolved.
      val binAttr = AttributeReference("__g_bin", LongType, nullable = false)()
      val gen = binExplode(intervalPlan0, lo, hi, bw, binAttr, "RangeJoinRewrite")
      val newCond = And(EqualTo(binOf(p, bw), binAttr), cond)
      // joinType is Inner, or an outer join preserving the point side:
      // each matching pair meets in exactly one bin (the point's), and
      // an unmatched preserved point emits exactly one null row — the
      // interval side's bin replicas are all on the nullable side
      val joined =
        if (pointOnLeft) Join(pointPlan, gen, joinType, Some(newCond), hint)
        else Join(gen, pointPlan, joinType, Some(newCond), hint)
      // preserve the original output (drop the bin column)
      Project(j.output, joined)
    }
  }

  /** Interval-OVERLAP shape: `lLo <= rHi && rLo <= lHi` with each
    * interval's bounds on one side. Both sides bin-explode and each
    * overlapping pair is kept in ONE canonical meeting bin — the bin
    * of `greatest(lLo, rLo)` (the overlap's start, which both
    * intervals cover) — mirroring
    * [[graft.operators.RangeJoin.intervalOverlapJoin]] on the logical
    * plan.
    *
    * SAFETY: unlike the point shape (where an inverted interval makes
    * the predicate unsatisfiable, so the `hi >= lo` filter is free),
    * an inverted "interval" CAN satisfy the overlap predicate — e.g.
    * lLo=10 > lHi=0 against rLo=0, rHi=100 — and the decomposition
    * would silently drop it. The rewrite therefore fires ONLY when
    * each side's plan CONSTRAINTS prove `hi >= lo` (an upstream
    * `.filter($"lo" <= $"hi")` — constraint propagation carries it
    * here); otherwise it warns with that exact remedy. Inner only:
    * both sides replicate, so neither can be outer-preserved.
    */
  private def rewriteOverlap(
      j: Join, left: LogicalPlan, right: LogicalPlan, joinType: JoinType,
      conjuncts: Seq[Expression], cond: Expression, bw: Long,
      hint: JoinHint): Option[LogicalPlan] = {
    // normalize every cross-side inequality to (x, y) meaning x <= y
    val ineqs = conjuncts.collect {
      case LessThanOrEqual(x, y) => (x, y)
      case GreaterThanOrEqual(x, y) => (y, x)
    }
    val shaped = (for {
      ((x1, y1), i1) <- ineqs.zipWithIndex
      ((x2, y2), i2) <- ineqs.zipWithIndex
      if i1 != i2
      s1 <- referencesSplit(x1, y1, left, right)
      s2 <- referencesSplit(x2, y2, left, right)
      if s1 != s2 // opposite orientations: lLo <= rHi AND rLo <= lHi
    } yield if (s1) (x1, y2, x2, y1) else (x2, y1, x1, y2)).distinct
    if (shaped.isEmpty) return None // not overlap-shaped: silent
    val typed = shaped.filter { case (lLo, lHi, rLo, rHi) =>
      Seq(lLo, lHi, rLo, rHi).forall(integral)
    }
    def proven(plan: LogicalPlan, lo: Expression, hi: Expression): Boolean =
      plan.constraints.exists(c =>
        c.semanticEquals(GreaterThanOrEqual(hi, lo)) ||
          c.semanticEquals(LessThanOrEqual(lo, hi)))
    val usable = typed.find { case (lLo, lHi, rLo, rHi) =>
      joinType == Inner && proven(left, lLo, lHi) && proven(right, rLo, rHi)
    }
    if (usable.isEmpty) {
      val reason =
        if (typed.isEmpty)
          "the bound columns are not all integral types (bin the values " +
            "to long — e.g. epoch units — upstream)"
        else if (joinType != Inner)
          s"join type $joinType is not supported (both sides replicate " +
            "across bins, so only Inner preserves multiplicities)"
        else
          "the plans do not PROVE lo <= hi on both sides — an inverted " +
            "row can satisfy the overlap predicate yet be dropped by the " +
            "decomposition; add .filter($\"lo\" <= $\"hi\") on each " +
            "input (constraint propagation carries it to the join), or " +
            "call graft.operators.RangeJoin.intervalOverlapJoin, which " +
            "documents that contract"
      logWarning(
        s"RangeJoinRewrite: a $joinType join looks interval-overlap-" +
          s"shaped (lLo <= rHi && rLo <= lHi) but was NOT rewritten " +
          s"because $reason; the nested-loop/cartesian plan remains " +
          "and will not scale.")
      return None
    }
    usable.map { case (lLo, lHi, rLo, rHi) =>
      val lBin = AttributeReference("__g_lbin", LongType, nullable = false)()
      val rBin = AttributeReference("__g_rbin", LongType, nullable = false)()
      val genL = binExplode(left, lLo, lHi, bw, lBin, "RangeJoinRewrite")
      val genR = binExplode(right, rLo, rHi, bw, rBin, "RangeJoinRewrite")
      val meet = binOf(Greatest(Seq(Cast(lLo, LongType), Cast(rLo, LongType))), bw)
      val newCond = And(And(EqualTo(lBin, rBin), EqualTo(lBin, meet)), cond)
      Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
    }
  }

  /** Some(true) if `a` reads only from `left` and `b` only from
    * `right`; Some(false) for the mirror; None otherwise.
    */
  private def referencesSplit(
      a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val aL = a.references.subsetOf(left.outputSet)
    val aR = a.references.subsetOf(right.outputSet)
    val bL = b.references.subsetOf(left.outputSet)
    val bR = b.references.subsetOf(right.outputSet)
    if (a.references.isEmpty || b.references.isEmpty) None
    else if (aL && bR) Some(true)
    else if (aR && bL) Some(false)
    else None
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}
