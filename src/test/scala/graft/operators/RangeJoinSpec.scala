package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  private def points(rows: (Long, Long)*) = // (pid, p)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, p) => Row(i, p) }, 3),
      StructType(Seq(StructField("pid", LongType), StructField("p", LongType))))

  private def intervals(rows: (Long, Long, Long)*) = // (iid, lo, hi)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, l, h) => Row(i, l, h) }, 2),
      StructType(Seq(StructField("iid", LongType),
        StructField("lo", LongType), StructField("hi", LongType))))

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("binned range join equals naive cartesian filter, both ends inclusive") {
    val ps = points((1L, 0L), (2L, 5L), (3L, 10L), (4L, 17L), (5L, 23L), (6L, -4L))
    val is = intervals((10L, 0L, 10L), (11L, 5L, 5L), (12L, 16L, 30L), (13L, -10L, -1L))
    val naive = ps.crossJoin(is)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
    for (binW <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.rangeJoin(ps, is, "p", "lo", "hi", binWidth = binW)
      assert(pairs(got) === pairs(naive), s"binWidth=$binW")
      // each (point, interval) pair meets in exactly one bin: no dups
      assert(got.count() === pairs(naive).size, s"binWidth=$binW emitted duplicates")
    }
    // ground truth sanity: 1 in [0,10]; 2 in [0,10] and [5,5]; 3 in [0,10];
    // 4,5 in [16,30]; -4 in [-10,-1] (negative bins floor correctly)
    assert(pairs(RangeJoin.rangeJoin(ps, is, "p", "lo", "hi", 10L)) ===
      Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 10L), (4L, 12L), (5L, 12L), (6L, 13L)))
  }

  test("equality keys restrict pairs to matching key values") {
    val ps = points((1L, 5L), (2L, 5L)).withColumn("pk", col("pid") % 2)
    val is = intervals((10L, 0L, 10L), (11L, 0L, 10L)).withColumn("ik", col("iid") % 2)
    val got = RangeJoin.rangeJoin(ps, is, "p", "lo", "hi", 4L,
      keys = Seq("pk" -> "ik"))
    assert(pairs(got) === Set((1L, 11L), (2L, 10L))) // 1%2=1 -> 11%2=1; 2%2=0 -> 10%2=0
  }

  test("empty intervals (hi < lo) are dropped, not exploded") {
    val got = RangeJoin.rangeJoin(points((1L, 5L)), intervals((10L, 8L, 2L)),
      "p", "lo", "hi", 1L)
    assert(got.count() === 0L)
  }

  test("maxBinsPerInterval guard fails fast on degenerate spans") {
    val err = intercept[Exception] {
      RangeJoin.rangeJoin(points((1L, 5L)), intervals((10L, 0L, 1000000L)),
        "p", "lo", "hi", binWidth = 1L, maxBinsPerInterval = 100L).count()
    }
    assert(err.getMessage.contains("rangeJoin") ||
      Option(err.getCause).exists(_.getMessage.contains("rangeJoin")))
    // and 0 disables the guard
    assert(RangeJoin.rangeJoin(points((1L, 5L)), intervals((10L, 0L, 1000000L)),
      "p", "lo", "hi", binWidth = 1L, maxBinsPerInterval = 0L).count() === 1L)
  }

  test("interval overlap join equals naive cartesian filter, no duplicate pairs") {
    val ls = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 0L, 10L), Row(2L, 5L, 25L), Row(3L, 30L, 30L), Row(4L, -12L, -2L)), 2),
      StructType(Seq(StructField("lid", LongType),
        StructField("llo", LongType), StructField("lhi", LongType))))
    val rs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, 8L, 12L), Row(11L, 26L, 40L), Row(12L, -5L, 1L), Row(13L, 50L, 60L)), 2),
      StructType(Seq(StructField("rid", LongType),
        StructField("rlo", LongType), StructField("rhi", LongType))))
    val naive = ls.crossJoin(rs)
      .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (binW <- Seq(1L, 4L, 7L, 100L)) {
      val got = RangeJoin.intervalOverlapJoin(ls, rs, "llo", "lhi", "rlo", "rhi", binW)
      val pairsGot = got.select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairsGot.toSet === naive, s"binWidth=$binW")
      assert(pairsGot.length === naive.size, s"binWidth=$binW emitted duplicates")
    }
    // ground truth: (1,10) 8-10; (1,12) 0-1; (2,10) 8-12; (2,11) none (25<26);
    // (3,11) 30; (4,12) -5..-2
    assert(naive === Set((1L, 10L), (1L, 12L), (2L, 10L), (3L, 11L), (4L, 12L)))
  }

  test("overlap join respects equality keys") {
    val ls = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 0L, 10L, "a"), Row(2L, 0L, 10L, "b")), 2),
      StructType(Seq(StructField("lid", LongType), StructField("llo", LongType),
        StructField("lhi", LongType), StructField("lk", StringType))))
    val rs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(10L, 5L, 6L, "a")), 1),
      StructType(Seq(StructField("rid", LongType), StructField("rlo", LongType),
        StructField("rhi", LongType), StructField("rk", StringType))))
    val got = RangeJoin.intervalOverlapJoin(ls, rs, "llo", "lhi", "rlo", "rhi", 4L,
      keys = Seq("lk" -> "rk"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  test("candidate volume is span/binWidth + 1 interval replicas, not quadratic") {
    // one interval of span 100 at binWidth 10 -> exactly 11 replicas join-side
    val is = intervals((1L, 0L, 100L))
    val binned = is.withColumn("__bin",
      explode(sequence(expr("(lo div 10) + (case when lo % 10 < 0 then -1 else 0 end)"),
        expr("(hi div 10) + (case when hi % 10 < 0 then -1 else 0 end)"))))
    assert(binned.count() === 11L)
  }
}
