package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class IntervalsSpec extends AnyFunSuite with SparkSpec {

  private def frame(parts: Int, rows: (String, Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, l, h) => Row(k, l, h) }, parts),
      StructType(Seq(StructField("k", StringType),
        StructField("lo", LongType), StructField("hi", LongType))))

  private def run(df: org.apache.spark.sql.DataFrame) =
    Intervals.mergeIntervals(df, "k", "lo", "hi")
      .orderBy("k", "merge_seq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("overlapping and touching intervals merge; strict gaps split") {
    val got = run(frame(2,
      ("a", 0L, 10L), ("a", 5L, 12L),   // overlap -> one span
      ("a", 12L, 20L),                  // touches 12 -> still same span
      ("a", 22L, 25L),                  // gap (21 uncovered) -> new span
      ("b", 0L, 1L)))
    assert(got.toSeq === Seq(
      ("a", 1L, 0L, 20L, 3L), ("a", 2L, 22L, 25L, 1L), ("b", 1L, 0L, 1L, 1L)))
  }

  test("containment and duplicates collapse into the surrounding span") {
    val got = run(frame(3,
      ("a", 0L, 100L), ("a", 10L, 20L), ("a", 10L, 20L), ("a", 99L, 150L)))
    assert(got.toSeq === Seq(("a", 1L, 0L, 150L, 4L)))
  }

  test("empty intervals (hi < lo) are dropped") {
    val got = run(frame(1, ("a", 10L, 5L), ("a", 0L, 3L)))
    assert(got.toSeq === Seq(("a", 1L, 0L, 3L, 1L)))
  }

  test("result is independent of input partitioning") {
    val rows = (1L to 400L).map(i => ("k" + (i % 5), i * 13L % 997L, i * 13L % 997L + (i % 37)))
    assert(run(frame(2, rows: _*)).toSeq === run(frame(17, rows: _*)).toSeq)
  }
}
