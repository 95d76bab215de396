package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EwmaSpec extends AnyFunSuite with SparkSpec {

  // (key, ts, order, value)
  private def frame(rows: (String, Long, Long, Double)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (k, t, o, v) => Row(k, t, o, v) }, 3),
      StructType(Seq(StructField("k", StringType), StructField("ts", LongType),
        StructField("o", LongType), StructField("v", DoubleType))))

  private def run(df: org.apache.spark.sql.DataFrame, alpha: Double) =
    Ewma.ewma(df, "k", "ts", "o", "v", alpha)
      .orderBy("k")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

  /** The reference recurrence, folded in plain Scala. */
  private def ref(alpha: Double, xs: Seq[Double]): Double =
    xs.tail.foldLeft(xs.head)((acc, x) => alpha * x + (1.0 - alpha) * acc)

  test("matches the hand recurrence, seeded at the first value") {
    val got = run(frame(
      ("a", 1L, 1L, 2.0), ("a", 2L, 2L, 10.0), ("a", 3L, 3L, 4.0)), 0.25)
    assert(got.toSeq === Seq(
      ("a", 3L, 4.0, ref(0.25, Seq(2.0, 10.0, 4.0)))))
    // e1=2, e2=.25*10+.75*2=4, e3=.25*4+.75*4=4
    assert(got(0)._4 === 4.0)
  }

  test("a single event is its own ewma") {
    assert(run(frame(("a", 9L, 1L, 7.5)), 0.5).toSeq === Seq(("a", 1L, 7.5, 7.5)))
  }

  test("order is (ts, order), not arrival: shuffled input folds identically") {
    val ordered = Seq.tabulate(40)(i => ("k", i.toLong, i.toLong, math.sin(i) * 10))
    val shuffled = new scala.util.Random(7).shuffle(ordered)
    val a = run(frame(ordered: _*), 0.3)
    val b = run(frame(shuffled: _*), 0.3)
    assert(a.toSeq === b.toSeq)
    assert(a(0)._4 === ref(0.3, ordered.map(_._4)))
  }

  test("equal timestamps break ties by the order column") {
    // (ts=5, o=1, 100.0) must fold BEFORE (ts=5, o=2, 0.0)
    val got = run(frame(("a", 5L, 2L, 0.0), ("a", 5L, 1L, 100.0)), 0.5)
    assert(got(0)._4 === ref(0.5, Seq(100.0, 0.0)))
    assert(got(0)._3 === 0.0) // last_val is the (5,2) event
  }

  test("keys fold independently; alpha=1 tracks the last value") {
    val got = run(frame(
      ("a", 1L, 1L, 3.0), ("a", 2L, 2L, 8.0),
      ("b", 1L, 3L, 5.0), ("b", 2L, 4L, 6.0)), 1.0)
    assert(got.map(r => (r._1, r._4)).toSeq === Seq(("a", 8.0), ("b", 6.0)))
  }

  test("alpha bounds are enforced") {
    intercept[IllegalArgumentException](Ewma.ewma(
      frame(("a", 1L, 1L, 1.0)), "k", "ts", "o", "v", 0.0))
    intercept[IllegalArgumentException](Ewma.ewma(
      frame(("a", 1L, 1L, 1.0)), "k", "ts", "o", "v", 1.5))
  }

  test("plan shape: one aggregate exchange, no window exchange") {
    val plan = Ewma.ewma(frame(("a", 1L, 1L, 1.0)), "k", "ts", "o", "v", 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"ewma must fold inside the aggregate, not via a window: $plan")
  }

  /** Holt reference fold in plain Scala — the same op order. */
  private def refHolt(
      alpha: Double, beta: Double, xs: Seq[Double]): (Double, Double) =
    xs.tail.foldLeft((xs.head, 0.0)) { case ((l, b), x) =>
      val l1 = alpha * x + (1.0 - alpha) * (l + b)
      (l1, beta * (l1 - l) + (1.0 - beta) * b)
    }

  test("holt matches the hand recurrence; a trending series forecasts ahead") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val rows = xs.zipWithIndex.map { case (v, i) =>
      ("a", (i + 1).toLong, (i + 1).toLong, v)
    }
    val got = Ewma.holt(frame(rows: _*), "k", "ts", "o", "v",
      alpha = 0.5, beta = 0.25).head()
    val (l, b) = refHolt(0.5, 0.25, xs)
    assert(got.getDouble(2) == l && got.getDouble(3) == b)
    assert(got.getDouble(4) == l + b)
    // on a rising series the forecast exceeds the level (trend > 0),
    // which plain EWMA structurally cannot do
    assert(b > 0.0 && got.getDouble(4) > l)
  }

  test("holt: single-event key is well-defined at (x, 0)") {
    val got = Ewma.holt(frame(("a", 1L, 1L, 7.0)), "k", "ts", "o", "v",
      0.5, 0.25).head()
    assert((got.getDouble(2), got.getDouble(3), got.getDouble(4)) ==
      (7.0, 0.0, 7.0))
  }

  test("holt beta=0 freezes the trend at its zero seed: level ewma-tracks") {
    // with b locked at 0, the level recurrence degenerates to ewma
    val rows = Seq(("a", 1L, 1L, 4.0), ("a", 2L, 2L, 8.0), ("a", 3L, 3L, 2.0))
    val got = Ewma.holt(frame(rows: _*), "k", "ts", "o", "v",
      alpha = 0.25, beta = 0.0).head()
    assert(got.getDouble(2) == ref(0.25, Seq(4.0, 8.0, 2.0)))
    assert(got.getDouble(3) == 0.0)
  }
}
