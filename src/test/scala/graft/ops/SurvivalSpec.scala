package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** KM semantics: hand-computed curve, censoring vs death accounting,
  * the at-risk identity, and monotonicity.
  */
class SurvivalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // activity days per user; horizon = 3 (max last day), gap = 2:
  // F last=0 (death t=0), A/B last=1 (death t=1), C last=2 (2+2>3:
  // censored t=2), D/E last=3 (censored t=3)
  private def days = Seq(
    ("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L),
    ("C", 0L), ("C", 2L), ("D", 0L), ("D", 3L),
    ("E", 0L), ("E", 3L), ("F", 0L))
    .toDF("user_id", "day")

  private def curve = Survival.kaplanMeier(days, "user_id", "day", gapDays = 2)
    .orderBy("t").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("hand-computed KM curve with per-step integer flooring") {
    assert(curve.toSeq == Seq(
      // t=0: n=6 d=1        -> 1000000*5 div 6 = 833333
      (0L, 6L, 1L, 0L, 833333L),
      // t=1: n=5 d=2        -> 833333*3 div 5 = 499999
      (1L, 5L, 2L, 0L, 499999L),
      // t=2: n=3 censor-only -> unchanged
      (2L, 3L, 0L, 1L, 499999L),
      // t=3: n=2 censor-only -> unchanged
      (3L, 2L, 0L, 2L, 499999L)))
  }

  test("at-risk identity and monotone survival") {
    val total = curve.map(c => c._3 + c._4).sum
    assert(total == 6L)
    curve.foldLeft(total) { case (expectRisk, (t, n, d, c, _)) =>
      assert(n == expectRisk, s"at-risk broken at t=$t")
      expectRisk - d - c
    }
    assert(curve.map(_._5).toSeq == curve.map(_._5).toSeq.sorted.reverse)
  }

  test("censored users never count as deaths (gap larger than the window)") {
    // gap 10 > horizon: nobody can be 10 days stale -> zero deaths,
    // survival stays at 1e6 everywhere
    val c = Survival.kaplanMeier(days, "user_id", "day", gapDays = 10)
      .orderBy("t").collect()
    assert(c.map(_.getLong(2)).sum == 0L)
    assert(c.map(_.getLong(4)).forall(_ == 1000000L))
  }

  test("gap 0 makes everyone short of the horizon a death") {
    val c = Survival.kaplanMeier(days, "user_id", "day", gapDays = 0)
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // last=3 users sit AT the horizon: ld + 0 <= h -> also deaths
    assert(c.map(_._2).sum == 6L && c.map(_._3).sum == 0L)
  }

  test("partition count does not change the curve") {
    val a = Survival.kaplanMeier(days.repartition(7), "user_id", "day", 2)
      .orderBy("t").collect().toSeq
    assert(a == curve.toSeq.map(t =>
      org.apache.spark.sql.Row(t._1, t._2, t._3, t._4, t._5)))
  }
}
