package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CohortSpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: (String, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (u, t) => Row(u, t) }, 3),
      StructType(Seq(StructField("u", StringType), StructField("ts", LongType))))

  private def run(df: org.apache.spark.sql.DataFrame, bucket: Long) =
    Cohort.retention(df, "u", "ts", bucket)
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("retention triangle: cohort by first event, distinct keys per offset") {
    val got = run(frame(
      ("a", 5L), ("a", 15L), ("a", 17L), ("a", 35L), // cohort 0, offsets 0,1,3
      ("b", 8L), ("b", 25L),                         // cohort 0, offsets 0,2
      ("c", 12L), ("c", 22L)), 10L)                  // cohort 1, offsets 0,1
    assert(got.toSeq === Seq(
      (0L, 0L, 2L), // a, b
      (0L, 1L, 1L), // a (two events in bucket 1 count once)
      (0L, 2L, 1L), // b
      (0L, 3L, 1L), // a
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("offset-0 count equals cohort size") {
    val rows = (1L to 50L).map(i => ("u" + i, i * 3L)) ++
      (1L to 50L).flatMap(i => if (i % 2 == 0) Some(("u" + i, 200L + i)) else None)
    val got = run(frame(rows: _*), 100L)
    assert(got.filter(_._2 == 0L).map(_._3).sum === 50L)
  }

  test("negative timestamps floor into the correct cohort") {
    val got = run(frame(("a", -5L), ("a", 5L)), 10L)
    assert(got.toSeq === Seq((-1L, 0L, 1L), (-1L, 1L, 1L)))
  }

  test("result is independent of input partitioning") {
    val rows = (1L to 300L).map(i => ("u" + (i % 40), i * 7L))
    assert(run(frame(rows: _*), 50L).toSeq ===
      run(frame(rows: _*).repartition(17), 50L).toSeq)
  }

  private def stages(df: org.apache.spark.sql.DataFrame, bucket: Long) =
    Cohort.lifecycle(df, "u", "ts", bucket)
      .orderBy("bucket", "stage").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("lifecycle: new/retained/resurrected/churned with churn at bucket+1") {
    // u1: buckets 0,1,3 (gap at 2); u2: bucket 0 only
    val got = stages(frame(
      ("u1", 5L), ("u1", 15L), ("u1", 35L), ("u2", 3L)), 10L)
    assert(got.toSeq === Seq(
      (0L, "new", 2L),
      (1L, "churned", 1L),     // u2 never returns
      (1L, "retained", 1L),    // u1
      (2L, "churned", 1L),     // u1's gap: next activity is bucket 3
      (3L, "resurrected", 1L), // u1 returns after the gap
      (4L, "churned", 1L)))    // u1's last observed bucket
  }

  test("lifecycle identity: active(b) = new + retained + resurrected") {
    val rows = (1L to 400L).map(i =>
      ("u" + (i % 23), (i * 13L) % 170L))
    val df = frame(rows: _*)
    val got = stages(df, 10L)
    val active = df.selectExpr("u", "ts div 10 AS b").distinct()
      .groupBy("b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nonChurn = got.filter(_._2 != "churned")
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._3).sum }
    assert(nonChurn === active)
  }
}
