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
}
