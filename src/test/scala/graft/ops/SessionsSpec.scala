package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SessionsSpec extends AnyFunSuite with SparkSpec {

  // (user, event, ts) — ts in small integer "ns" for readability
  private def ev(rows: (Long, Long, Long)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3),
      StructType(Seq(
        StructField("user_id", LongType, nullable = false),
        StructField("event_id", LongType, nullable = false),
        StructField("ts", LongType, nullable = false))))

  test("sessionize numbers sessions 1..k per key, splitting at gaps > gap") {
    val out = Sessions.sessionize(
      ev((1L, 1L, 0L), (1L, 2L, 5L), (1L, 3L, 100L), (1L, 4L, 103L),
        (2L, 5L, 50L)),
      "user_id", "ts", "event_id", gap = 10L)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("a gap of exactly `gap` does NOT split (strict > semantics)") {
    val out = Sessions.sessionize(
      ev((1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 21L)),
      "user_id", "ts", "event_id", gap = 10L)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("sessionSummary aggregates bounds and counts per session") {
    val out = Sessions.sessionSummary(
      ev((1L, 1L, 0L), (1L, 2L, 5L), (1L, 3L, 100L)),
      "user_id", "ts", "event_id", gap = 10L)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("start_ts"), r.getAs[Long]("end_ts"))).toMap
    assert(out == Map((1L, 1L) -> (2L, 0L, 5L), (1L, 2L) -> (1L, 100L, 100L)))
  }

  test("equal timestamps land in one session — numbering is partition-independent") {
    // GENUINE ties: each user gets PAIRS of events sharing a timestamp
    // (i/6 repeats twice per user), including ties right at session
    // boundaries — the gap between tied events is 0, so they can never
    // split, and the numbering must come out identical however the
    // input is partitioned
    val rows = (0L until 60L).map(i => (i % 3, i, (i / 6) * 100L))
    val a = Sessions.sessionize(ev(rows: _*), "user_id", "ts", "event_id", gap = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("session_seq"))).toSet
    val b = Sessions.sessionize(ev(rows: _*).repartition(7),
      "user_id", "ts", "event_id", gap = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("session_seq"))).toSet
    assert(a == b)
    // user 0: events at ts 0,0,100,100,... -> each tied pair is one
    // session, sessions number 1,1,2,2,3,3,...
    val user0 = a.filter(_._1 == 0L).toSeq.sortBy(_._2).map(_._3)
    assert(user0 == Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L, 5L, 5L, 6L, 6L, 7L, 7L, 8L, 8L, 9L, 9L, 10L, 10L))
  }

  test("trailing frame is inclusive at exactly `trailing` distance (both ends)") {
    val out = Sessions.trailingStats(
      ev((1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 101L)),
      "user_id", "ts", trailing = 100L)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_trailing")).toMap
    // ts=100: frame [0,100] INCLUDES the event exactly 100 old;
    // ts=101: frame [1,101] excludes it
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("trailingStats counts the value-based trailing frame, ties included") {
    val out = Sessions.trailingStats(
      ev((1L, 1L, 0L), (1L, 2L, 50L), (1L, 3L, 50L), (1L, 4L, 149L),
        (1L, 5L, 151L), (2L, 6L, 50L)),
      "user_id", "ts", trailing = 100L)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_trailing")).toMap
    // RANGE frame: rows 2 and 3 share ts=50, so each sees the other;
    // ts=149's frame [49,149] holds both 50s + itself (ts=0 is out);
    // ts=151's frame [51,151] holds only 149 + itself
    assert(out == Map(1L -> 1L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 2L, 6L -> 1L))
  }

  test("trailingStats max_trailing tracks the frame max when valueCol is set") {
    val df = ev((1L, 1L, 0L), (1L, 2L, 50L), (1L, 3L, 200L))
      .withColumn("value", org.apache.spark.sql.functions.col("event_id") * 10.0)
    val out = Sessions.trailingStats(df, "user_id", "ts", trailing = 100L,
      valueCol = Some("value"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("max_trailing")).toMap
    assert(out == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("guards: non-positive gap/trailing and reserved columns are rejected") {
    intercept[IllegalArgumentException] {
      Sessions.sessionize(ev((1L, 1L, 0L)), "user_id", "ts", "event_id", gap = 0L)
    }
    intercept[IllegalArgumentException] {
      Sessions.trailingStats(ev((1L, 1L, 0L)), "user_id", "ts", trailing = -1L)
    }
    intercept[IllegalArgumentException] {
      Sessions.trailingStats(
        ev((1L, 1L, 0L)).withColumnRenamed("event_id", "n_trailing"),
        "user_id", "ts", trailing = 10L)
    }
    intercept[IllegalArgumentException] {
      Sessions.sessionize(
        ev((1L, 1L, 0L)).withColumnRenamed("event_id", "session_seq"),
        "user_id", "ts", "session_seq", gap = 10L)
    }
  }

  test("firstPerWindow keeps the (ts, order)-minimum per key per bucket") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("u1", 5L, 2L, "a"), Row("u1", 3L, 9L, "b"),   // bucket 0 -> ts=3 wins
        Row("u1", 3L, 1L, "c"),                           // tie ts=3 -> order 1 wins
        Row("u1", 15L, 4L, "d"),                          // bucket 1
        Row("u2", -5L, 5L, "e")), 3),                     // bucket -1 (floors)
      StructType(Seq(StructField("u", StringType), StructField("ts", LongType),
        StructField("o", LongType), StructField("v", StringType))))
    val got = Sessions.firstPerWindow(df, "u", "ts", "o", window = 10L)
      .orderBy("u", "bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq === Seq(
      (0L, "u1", 3L, 1L, "c"), (1L, "u1", 15L, 4L, "d"), (-1L, "u2", -5L, 5L, "e")))
  }
}
