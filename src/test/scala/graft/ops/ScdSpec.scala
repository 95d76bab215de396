package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ScdSpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: (Long, Long, Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (k, t, o, v) => Row(k, t, o, v) }, 3),
      StructType(Seq(StructField("k", LongType), StructField("ts", LongType),
        StructField("o", LongType), StructField("v", StringType))))

  private def run(df: org.apache.spark.sql.DataFrame) =
    Scd.scd2(df, "k", "ts", "o", "v").orderBy("k", "run_idx").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))

  test("runs compress; intervals chain; open run has null valid_to") {
    val got = run(frame(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "a")))
    assert(got.toSeq === Seq(
      (1L, "a", 10L, 30L), (1L, "b", 30L, 40L), (1L, "a", 40L, -1L)))
  }

  test("null values open and close runs; first row always opens") {
    val got = run(frame(
      (1L, 1L, 1L, null), (1L, 2L, 2L, null), (1L, 3L, 3L, "x")))
    assert(got.map(r => (Option(r._2), r._3, r._4)).toSeq ===
      Seq((None, 1L, 3L), (Some("x"), 3L, -1L)))
  }

  test("keys are independent; equal timestamps order by the tie column") {
    val got = run(frame(
      (1L, 5L, 2L, "b"), (1L, 5L, 1L, "a"), (2L, 5L, 3L, "c")))
    assert(got.toSeq === Seq(
      (1L, "a", 5L, 5L), (1L, "b", 5L, -1L), (2L, "c", 5L, -1L)))
    // run_idx disambiguates the equal-timestamp runs for ordered dumps
    val idx = Scd.scd2(frame(
      (1L, 5L, 2L, "b"), (1L, 5L, 1L, "a")), "k", "ts", "o", "v")
      .orderBy("k", "run_idx").collect()
      .map(r => (r.getInt(1), r.getString(2)))
    assert(idx.toSeq === Seq((1, "a"), (2, "b")))
  }
}
