package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.TopK.top_k

class TopKSpec extends AnyFunSuite with SparkSpec {

  private def frame(parts: Int, rows: (String, Double, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (g, v, i) => Row(g, v, i) }, parts),
      StructType(Seq(StructField("g", StringType), StructField("v", DoubleType),
        StructField("id", LongType))))

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(top_k(col("v"), col("id"), k).as("top"))
      .select(col("g"), col("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[Row](1).map(x => (x.getDouble(0), x.getLong(1))).toList)
      .toMap

  test("keeps the k largest, best first, ties broken by smaller id") {
    val got = run(frame(3,
      ("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 7.0, 3L), ("a", 9.0, 0L), ("a", 1.0, 4L),
      ("b", 2.0, 9L)), 3)
    assert(got("a") === List((9.0, 0L), (9.0, 2L), (7.0, 3L)))
    assert(got("b") === List((2.0, 9L)))
  }

  test("result equals the window formulation on random data, any partitioning") {
    val rows = (1L to 800L).map(i =>
      ("g" + (i % 7), (i * 31 % 101).toDouble, i))
    for (parts <- Seq(1, 13)) {
      val got = run(frame(parts, rows: _*), 5)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
      val expect = frame(parts, rows: _*)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .orderBy(col("g"), col("rn"))
        .collect().groupBy(_.getString(0))
        .map { case (g, rs) => g -> rs.map(r => (r.getDouble(1), r.getLong(2))).toList }
      assert(got === expect, s"parts=$parts")
    }
  }

  test("map-side state stays bounded at k") {
    val agg = TopK(3)
    val b = (1L to 100L).foldLeft(agg.zero)(
      (acc, i) => agg.reduce(acc, (Some(i.toDouble), Some(i))))
    assert(b.items.size === 3)
    assert(agg.finish(b).map(_.value) === Seq(100.0, 99.0, 98.0))
  }

  test("null value or id rows are skipped, like the builtin aggregates") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", 5.0, 1L), Row("a", null, 2L), Row("a", 3.0, null),
        Row("a", 7.0, 3L), Row("b", null, null)), 2),
      StructType(Seq(StructField("g", StringType),
        StructField("v", DoubleType), StructField("id", LongType))))
    val got = df.groupBy("g").agg(top_k(col("v"), col("id"), 3).as("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[Row](1).map(x => (x.getDouble(0), x.getLong(1))).toList)
      .toMap
    assert(got("a") === List((7.0, 3L), (5.0, 1L)))
    assert(got("b") === Nil) // all inputs null: empty top-k, no crash
  }
}
