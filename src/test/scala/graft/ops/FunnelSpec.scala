package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FunnelSpec extends AnyFunSuite with SparkSpec {

  // (user, ts, type)
  private def frame(rows: (String, Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (u, t, e) => Row(u, t, e) }, 3),
      StructType(Seq(StructField("u", StringType), StructField("ts", LongType),
        StructField("e", StringType))))

  private val steps = Seq("A", "B", "C")

  private def times(df: org.apache.spark.sql.DataFrame, maxSpan: Long = 0L) =
    Funnel.funnelSteps(df, "u", "ts", "e", steps, maxSpan)
      .orderBy("u").collect()
      .map(r => (r.getString(0),
        (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))

  test("greedy earliest-first ordering; uncompleted suffix is null") {
    val got = times(frame(
      ("u1", 10L, "A"), ("u1", 20L, "B"), ("u1", 30L, "C"),  // full funnel
      ("u2", 10L, "B"), ("u2", 20L, "A"), ("u2", 30L, "B"),  // B before A ignored
      ("u3", 10L, "A"), ("u3", 5L, "C")))                    // C before A: no B
    assert(got.toSeq === Seq(
      ("u1", Seq(Some(10L), Some(20L), Some(30L))),
      ("u2", Seq(Some(20L), Some(30L), None)),
      ("u3", Seq(Some(10L), None, None))))
  }

  test("same-timestamp events do not advance the funnel (strict ordering)") {
    val got = times(frame(("u1", 10L, "A"), ("u1", 10L, "B"), ("u1", 20L, "B")))
    assert(got.toSeq === Seq(("u1", Seq(Some(10L), Some(20L), None))))
  }

  test("greedy anchor: earliest A wins even when a later A would convert better") {
    // A@10 (no B after within span), A@50 with B@55 — greedy anchors at 10
    val got = times(frame(("u1", 10L, "A"), ("u1", 50L, "A"), ("u1", 55L, "B")),
      maxSpan = 20L)
    assert(got.toSeq === Seq(("u1", Seq(Some(10L), None, None))))
  }

  test("maxSpan caps conversion relative to the step-1 anchor") {
    val df = frame(("u1", 10L, "A"), ("u1", 25L, "B"), ("u1", 40L, "C"))
    assert(times(df, maxSpan = 0L).toSeq ===
      Seq(("u1", Seq(Some(10L), Some(25L), Some(40L)))))
    assert(times(df, maxSpan = 20L).toSeq ===
      Seq(("u1", Seq(Some(10L), Some(25L), None)))) // C at 40: 30 > 20
  }

  test("summary counts are non-increasing down the funnel") {
    val got = Funnel.funnelSummary(frame(
      ("u1", 1L, "A"), ("u1", 2L, "B"), ("u1", 3L, "C"),
      ("u2", 1L, "A"), ("u2", 2L, "B"),
      ("u3", 1L, "A"), ("u4", 9L, "B")), "u", "ts", "e", steps)
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1, "A", 3L), (2, "B", 2L), (3, "C", 1L)))
  }

  test("repeated step names are rejected") {
    intercept[IllegalArgumentException] {
      Funnel.funnelSteps(frame(("u1", 1L, "A")), "u", "ts", "e", Seq("A", "A"))
    }
  }
}
