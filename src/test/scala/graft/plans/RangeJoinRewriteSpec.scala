package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftExtensions, SparkSpec}

class RangeJoinRewriteSpec extends AnyFunSuite with SparkSpec {

  /** A fresh session (same SparkContext) built WITH GraftExtensions —
    * extensions only apply at session construction, so the shared test
    * session can't see the rule. Active/default sessions are restored
    * afterwards and the new session is never stopped (shared context).
    */
  private def withExtendedSession[T](f: SparkSession => T): T = {
    spark.sparkContext // ensure shared context exists
    val orig = SparkSession.getActiveSession
    val origDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(s)
    finally {
      s.conf.unset("spark.graft.rangeJoin.binWidth")
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      orig.foreach(SparkSession.setActiveSession)
      origDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  private def points(s: SparkSession): DataFrame =
    s.createDataFrame(
      s.sparkContext.parallelize((0L until 200L).map(i => Row(i, i * 7L % 500L)), 3),
      StructType(Seq(StructField("pid", LongType), StructField("p", LongType))))

  private def intervals(s: SparkSession): DataFrame =
    s.createDataFrame(
      // includes one INVERTED interval (hi < lo): empty by definition —
      // the rewrite must filter it, not explode a descending sequence
      s.sparkContext.parallelize(
        (0L until 30L).map(i => Row(i, i * 17L, i * 17L + 25L)) :+
          Row(99L, 400L, 100L), 2),
      StructType(Seq(StructField("iid", LongType),
        StructField("lo", LongType), StructField("hi", LongType))))

  private def expected(s: SparkSession): Set[(Long, Long)] =
    points(s).crossJoin(intervals(s))
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("naive non-equi range join is rewritten to a binned equi-join") {
    withExtendedSession { s =>
      s.conf.set("spark.graft.rangeJoin.binWidth", "32")
      val joined = points(s).join(intervals(s),
        col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not rewrite the non-equi join:\n$plan")
      assert(plan.contains("Generate"), "expected the interval bin explode")
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet === expected(s))
      assert(got.length === got.toSet.size, "rewrite introduced duplicate pairs")
    }
  }

  test("mirrored orientation (intervals on the left) also rewrites") {
    withExtendedSession { s =>
      s.conf.set("spark.graft.rangeJoin.binWidth", "32")
      val joined = intervals(s).join(points(s),
        col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === expected(s))
    }
  }

  test("degenerate interval spans raise instead of materializing") {
    withExtendedSession { s =>
      s.conf.set("spark.graft.rangeJoin.binWidth", "1")
      s.conf.set("spark.graft.rangeJoin.maxBinsPerInterval", "1000")
      try {
        val wide = s.createDataFrame(
          s.sparkContext.parallelize(Seq(Row(1L, 0L, 100000000L)), 1),
          StructType(Seq(StructField("iid", LongType),
            StructField("lo", LongType), StructField("hi", LongType))))
        val err = intercept[Exception] {
          points(s).join(wide,
            col("p") >= col("lo") && col("p") <= col("hi")).count()
        }
        def msgs(t: Throwable): Seq[String] =
          Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
        assert(msgs(err).exists(m => m != null && m.contains("RangeJoinRewrite")),
          s"expected the guard's message, got: ${msgs(err)}")
      } finally s.conf.unset("spark.graft.rangeJoin.maxBinsPerInterval")
    }
  }

  test("without the config the rule is inert") {
    withExtendedSession { s =>
      val joined = points(s).join(intervals(s),
        col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"),
        s"expected the naive plan without opt-in:\n$plan")
    }
  }

  test("joins with an equality conjunct are left untouched") {
    withExtendedSession { s =>
      s.conf.set("spark.graft.rangeJoin.binWidth", "32")
      val iv = intervals(s).withColumn("ik", col("iid") % 3)
      val pt = points(s).withColumn("pk", col("pid") % 3)
      val joined = pt.join(iv,
        col("pk") === col("ik") &&
          col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"),
        s"rule should not fire when an equi key exists:\n$plan")
      // and correctness unchanged
      val exp = pt.crossJoin(iv.withColumnRenamed("ik", "ik2"))
        .filter(col("pk") === col("ik2") &&
          col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === exp)
    }
  }
}
