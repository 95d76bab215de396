package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ProfileSpec extends AnyFunSuite with SparkSpec {

  private val df = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, "a", null),
      Row(2L, "b", java.lang.Double.valueOf(1.5)),
      Row(2L, null, java.lang.Double.valueOf(-3.0)),
      Row(10L, "a", null)), 2),
    StructType(Seq(StructField("k", LongType), StructField("s", StringType),
      StructField("v", DoubleType))))

  test("per-column counts, nulls, distincts, min/max") {
    val got = Profile.profile(df, Seq("k", "s", "v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    assert(got === Seq(
      ("k", 4L, 0L, 3L, "1", "10"),     // numeric order: max is 10, not "2"
      ("s", 4L, 1L, 2L, "a", "b"),
      ("v", 4L, 2L, 2L, "-3.0", "1.5")))
  }

  test("column order follows the request, not the schema") {
    val got = Profile.profile(df, Seq("v", "k")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("v", "k"))
  }

  test("heavyHitters ranks keys by count with exact shares, ties by key") {
    val out = Profile.heavyHitters(df, Seq("k"), k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((2L, 2L, 0.5), (1L, 1L, 0.25)))
  }

  test("heavyHitters supports composite keys and rejects bad input") {
    val out = Profile.heavyHitters(df, Seq("k", "s"), k = 10).collect()
    assert(out.length === 4) // (2,b),(2,null),(1,a),(10,a) all count 1
    assert(out.map(_.getLong(2)).forall(_ == 1L))
    intercept[IllegalArgumentException] {
      Profile.heavyHitters(df, Seq("nope"), 5)
    }
    intercept[IllegalArgumentException] {
      Profile.heavyHitters(df, Seq("k"), 0)
    }
  }

  test("unknown columns are rejected") {
    intercept[IllegalArgumentException] { Profile.profile(df, Seq("nope")) }
  }

  private def advisorRows(n: Int, ndv: Int) = {
    // n rows cycling through ndv distinct long values
    val rows = (0 until n).map(i => Row(java.lang.Long.valueOf(i % ndv)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("c", LongType))))
  }

  test("encodingAdvisor verdict boundaries: rle 16, dict density and 64Ki caps") {
    def verdict(n: Int, ndv: Int): String =
      Profile.encodingAdvisor(advisorRows(n, ndv), Seq("c"))
        .collect().head.getString(4)
    assert(verdict(200, 16) == "rle")     // at the rle cap
    assert(verdict(200, 17) == "dict")    // past rle, 17*10 <= 200
    assert(verdict(160, 17) == "plain")   // 17*10 > 160: repeats too rare
    assert(verdict(200, 20) == "dict")
  }

  test("encodingAdvisor width is milli-chars over NON-NULL values only") {
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("ab"), Row("abcd"), Row(null)), 2),
      StructType(Seq(StructField("s", StringType))))
    val r = Profile.encodingAdvisor(d, Seq("s")).collect().head
    assert(r.getLong(1) == 3L)            // n_rows counts nulls
    assert(r.getLong(3) == 3000L)         // (2+4)*1000 div 2 non-null
  }

  test("encodingAdvisor on an all-null column is defined, not a crash") {
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null), Row(null)), 2),
      StructType(Seq(StructField("s", StringType))))
    val r = Profile.encodingAdvisor(d, Seq("s")).collect().head
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getString(4) == "rle")
  }
}
