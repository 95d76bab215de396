package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TransitionsSpec extends AnyFunSuite with SparkSpec {

  private def events(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "ts", "event_id", "event_type")
  }

  test("adjacent pairs per user; last event contributes nothing") {
    val out = Transitions.transitionCensus(
      events((1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"),
        (1L, 30L, 3L, "view"), (2L, 5L, 4L, "view"), (2L, 6L, 5L, "buy")),
      "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // user 1: view->click, click->view; user 2: view->buy
    assert(out(("view", "click")) == (1L, 2L, 500000L))
    assert(out(("view", "buy")) == (1L, 2L, 500000L))
    assert(out(("click", "view")) == (1L, 1L, 1000000L))
    assert(out.size == 3)
  }

  test("equal-timestamp ties order by event id; self-transitions kept") {
    val out = Transitions.transitionCensus(
      events((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 10L, 3L, "b")),
      "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // order by (ts, id): a, b, b -> a->b, b->b
    assert(out == Map(("a", "b") -> 1L, ("b", "b") -> 1L))
  }

  test("conditional ppm floors: P(dst|src) = n*1e6 div n_src") {
    val rows = Seq.tabulate(3)(i => (1L, i.toLong, i.toLong, "x")) :+
      ((1L, 3L, 3L, "y"))
    val out = Transitions.transitionCensus(
      events(rows: _*), "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // from x: x->x twice, x->y once -> 666666 and 333333 (floored)
    assert(out(("x", "x")) == 666666L)
    assert(out(("x", "y")) == 333333L)
  }
}
