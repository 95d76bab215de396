package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, IntegerType, ShortType, ByteType}

/** Catalyst optimizer rule: rewrite a naive point-in-interval
  * NON-EQUI inner join — `points JOIN intervals ON p >= lo AND
  * p <= hi` with no equality predicate — into the binned equi-join
  * decomposition of [[graft.operators.RangeJoin]], directly on the
  * logical plan. Without this, Spark plans such joins as
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
  * the user can make. The rule matches STRICTLY: inner join, both
  * bounds present on one interval side, integral types, and NO
  * equality conjunct (if one exists Spark already hash-joins on it).
  * Everything else passes through untouched. Registered by
  * [[graft.GraftExtensions]] as `injectOptimizerRule`.
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
          case j @ Join(left, right, Inner, Some(cond), hint) =>
            rewrite(j, left, right, cond, bw, hint).getOrElse(j)
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

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression,
      bw: Long, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // any equality across the two sides -> Spark hash-joins already
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => referencesSplit(a, b, left, right).isDefined
      case EqualNullSafe(a, b) => referencesSplit(a, b, left, right).isDefined
      case _ => false
    }
    if (hasEqui) return None

    // find p >= lo and p <= hi with a consistent (point, interval) split
    val lowerBounds = conjuncts.collect {
      case GreaterThanOrEqual(p, lo) => (p, lo)
      case LessThanOrEqual(lo, p) => (p, lo)
    }
    val upperBounds = conjuncts.collect {
      case LessThanOrEqual(p, hi) => (p, hi)
      case GreaterThanOrEqual(hi, p) => (p, hi)
    }
    val candidates = for {
      (p1, lo) <- lowerBounds
      (p2, hi) <- upperBounds
      if p1.semanticEquals(p2)
      if integral(p1) && integral(lo) && integral(hi)
      split <- referencesSplit(p1, lo, left, right)
      split2 <- referencesSplit(p1, hi, left, right)
      if split == split2
    } yield (p1, lo, hi, split)
    candidates.headOption.map { case (p, lo, hi, pointOnLeft) =>
      val (pointPlan, intervalPlan0) = if (pointOnLeft) (left, right) else (right, left)
      // the guards the manual operator has, mirrored here:
      // (1) hi >= lo — an inverted interval would make sequence()
      //     count DOWN (step −1) and replicate instead of dropping;
      // (2) the explode's upper bound raises past maxBins — one
      //     degenerate interval (a Long.MaxValue sentinel timestamp)
      //     must fail fast, not materialize toward the array limit
      val intervalPlan = Filter(GreaterThanOrEqual(hi, lo), intervalPlan0)
      val maxBins = spark.conf
        .getOption("spark.graft.rangeJoin.maxBinsPerInterval")
        .map(_.toLong).getOrElse(65536L)
      val loBin = binOf(lo, bw)
      val hiBin = binOf(hi, bw)
      val nBins = Add(Subtract(hiBin, loBin), Literal(1L, LongType))
      val hiGuarded =
        if (maxBins > 0)
          CaseWhen(Seq((GreaterThan(nBins, Literal(maxBins, LongType)),
            Cast(new RaiseError(Literal.create(
              s"RangeJoinRewrite: interval spans more than $maxBins bins " +
                "(widen spark.graft.rangeJoin.binWidth or raise " +
                "spark.graft.rangeJoin.maxBinsPerInterval)")),
              LongType))), hiBin)
        else hiBin
      // interval side: explode(sequence(bin(lo), bin(hi))) as __g_bin
      val binAttr = AttributeReference("__g_bin", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: it is UNRESOLVED until a
      // timezone is attached, and analysis (which normally attaches
      // it) already ran — set it explicitly or the optimizer rejects
      // the plan as newly-unresolved
      val seq = new Sequence(loBin, hiGuarded, None,
        Some(spark.sessionState.conf.sessionLocalTimeZone))
      val gen = Generate(
        Explode(seq),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binAttr), child = intervalPlan)
      val newCond = And(EqualTo(binOf(p, bw), binAttr), cond)
      val joined =
        if (pointOnLeft) Join(pointPlan, gen, Inner, Some(newCond), hint)
        else Join(gen, pointPlan, Inner, Some(newCond), hint)
      // preserve the original output (drop the bin column)
      Project(j.output, joined)
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
