package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Budget selection pinned on the properties the distributed scan
  * must preserve: exactness vs a driver-computed reference,
  * independence from input partitioning (the offset arithmetic), and
  * monotonicity in the budget (the start-under-budget boundary rule).
  */
class SelectionSpec extends AnyFunSuite with SparkSpec {

  private def corpus() = {
    import spark.implicits._
    // scores with ties (broken by id), varied token counts
    (1L to 100L).map(i => (i, (i % 7).toDouble, 10L + i % 13))
      .toDF("id", "score", "n_tokens")
  }

  private def reference(budget: Long): Map[Long, (Long, Boolean)] = {
    var run = 0L
    (1L to 100L).map(i => (i, (i % 7).toDouble, 10L + i % 13))
      .sortBy { case (i, s, _) => (-s, i) }
      .map { case (i, _, n) =>
        val start = run; run += n; i -> (start, start < budget)
      }.toMap
  }

  private def run(df: org.apache.spark.sql.DataFrame, budget: Long) =
    Selection.selectToBudget(df, "id", "score", "n_tokens", budget)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap

  test("start_total and selection match the sequential reference exactly") {
    val got = run(corpus(), budget = 500L)
    assert(got == reference(500L))
  }

  test("output is independent of input partitioning and partition count") {
    val base = run(corpus(), 500L)
    assert(run(corpus().repartition(17), 500L) == base)
    assert(Selection.selectToBudget(corpus(), "id", "score", "n_tokens",
      500L, partitions = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap == base)
  }

  test("selection is monotone in the budget and keeps the straddling row") {
    val small = run(corpus(), 300L).filter(_._2._2).keySet
    val large = run(corpus(), 800L).filter(_._2._2).keySet
    assert(small.subsetOf(large), "growing the budget dropped rows")
    // the row that STARTS under budget is kept even if it crosses it:
    // selected token mass must reach (or pass) the budget when enough
    // corpus exists
    val sel = run(corpus(), 300L)
    val tok = corpus().collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val mass = sel.collect { case (id, (_, true)) => tok(id) }.sum
    assert(mass >= 300L, s"selected mass $mass fell short of the budget")
  }

  test("zero budget selects nothing; oversized budget selects everything") {
    assert(run(corpus(), 0L).values.forall(!_._2))
    assert(run(corpus(), 1000000L).values.forall(_._2))
  }
}
