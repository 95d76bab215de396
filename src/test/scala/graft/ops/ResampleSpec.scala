package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ResampleSpec extends AnyFunSuite with SparkSpec {

  // (key, ts, order, value)
  private def frame(rows: (String, Long, Long, Double)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (k, t, o, v) => Row(k, t, o, v) }, 3),
      StructType(Seq(StructField("k", StringType), StructField("ts", LongType),
        StructField("o", LongType), StructField("v", DoubleType))))

  private def run(df: org.apache.spark.sql.DataFrame, step: Long, maxB: Long = 1000000L) =
    Resample.resample(df, "k", "ts", "o", "v", step, maxB)
      .orderBy("k", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))

  test("gaps are filled with zero-count rows and forward-filled values") {
    // key a: events in buckets 0 and 3 -> grid 0,1,2,3; buckets 1,2 carry 1.5
    val got = run(frame(("a", 5L, 1L, 1.0), ("a", 9L, 2L, 1.5), ("a", 35L, 3L, 9.0)), 10L)
    assert(got.toSeq === Seq(
      ("a", 0L, 2L, 1.5), // last in bucket 0 is ts=9 -> 1.5
      ("a", 1L, 0L, 1.5), // gap: carried forward
      ("a", 2L, 0L, 1.5),
      ("a", 3L, 1L, 9.0)))
  }

  test("bucket tie-break is by (ts, order): equal timestamps pick max order") {
    val got = run(frame(("a", 5L, 1L, 1.0), ("a", 5L, 7L, 42.0), ("a", 5L, 3L, 2.0)), 10L)
    assert(got.toSeq === Seq(("a", 0L, 3L, 42.0)))
  }

  test("keys get independent grids; negative timestamps floor correctly") {
    val got = run(frame(("a", -5L, 1L, 1.0), ("a", 15L, 2L, 2.0), ("b", 100L, 3L, 3.0)), 10L)
    // -5 div 10 floors to bucket -1 (not 0)
    assert(got.map(x => (x._1, x._2)).toSeq ===
      Seq(("a", -1L), ("a", 0L), ("a", 1L), ("b", 10L)))
    assert(got(1)._3 === 0L && got(1)._4 === 1.0) // gap bucket 0 carries -5's value
  }

  test("result is independent of input partitioning") {
    val rows = (1L to 200L).map(i => ("k" + (i % 3), i * 7L, i, i.toDouble))
    val a = run(frame(rows: _*), 25L)
    val b = Resample.resample(frame(rows: _*).repartition(13), "k", "ts", "o", "v", 25L)
      .orderBy("k", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(a.toSeq === b.toSeq)
  }

  test("maxBucketsPerKey guard fails fast on a degenerate span") {
    val df = frame(("a", 0L, 1L, 1.0), ("a", 1000000L, 2L, 2.0))
    val err = intercept[Exception] { run(df, 1L, maxB = 100L) }
    assert(err.getMessage.contains("resample") ||
      Option(err.getCause).exists(_.getMessage.contains("resample")))
    assert(run(df, 1L, maxB = 0L).length === 1000001) // 0 disables
  }
}
