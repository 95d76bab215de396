package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfSpec extends AnyFunSuite with SparkSpec {

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  private def frame(schema: Seq[StructField], rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(schema))

  test("backward as-of join picks latest right row at or before left time") {
    val trades = frame(
      Seq(StructField("sym", StringType), StructField("t", TimestampType),
        StructField("qty", IntegerType)),
      Seq(
        Row("A", ts(10), 1), // after quote at 5 -> px 100.0
        Row("A", ts(20), 2), // tie with quote at 20 -> inclusive, px 101.0
        Row("B", ts(10), 3), // no quote for B before 10 -> null
        Row("B", ts(40), 4))) // quote at 30 -> px 200.0
    val quotes = frame(
      Seq(StructField("sym", StringType), StructField("qt", TimestampType),
        StructField("px", DoubleType)),
      Seq(
        Row("A", ts(5), 100.0),
        Row("A", ts(20), 101.0),
        Row("A", ts(25), 102.0),
        Row("B", ts(30), 200.0)))

    val out = AsOf.asofJoinBackward(
      trades, quotes, "t", "qt", by = Seq("sym"), payload = Seq("px"))
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Int]("qty"),
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)))
      .toSet

    assert(out == Set(
      ("A", 1, Some(100.0)),
      ("A", 2, Some(101.0)),
      ("B", 3, None),
      ("B", 4, Some(200.0))))
  }

  test("forward as-of join picks earliest right row at or after left time") {
    val trades = frame(
      Seq(StructField("sym", StringType), StructField("t", TimestampType),
        StructField("qty", IntegerType)),
      Seq(
        Row("A", ts(10), 1), // next quote at 20 -> px 101.0
        Row("A", ts(20), 2), // tie with quote at 20 -> inclusive, px 101.0
        Row("A", ts(30), 3), // no quote after 25 -> null
        Row("B", ts(10), 4))) // quote at 30 -> px 200.0
    val quotes = frame(
      Seq(StructField("sym", StringType), StructField("qt", TimestampType),
        StructField("px", DoubleType)),
      Seq(
        Row("A", ts(5), 100.0),
        Row("A", ts(20), 101.0),
        Row("A", ts(25), 102.0),
        Row("B", ts(30), 200.0)))

    val out = AsOf.asofJoinForward(
      trades, quotes, "t", "qt", by = Seq("sym"), payload = Seq("px"))
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Int]("qty"),
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)))
      .toSet

    assert(out == Set(
      ("A", 1, Some(101.0)),
      ("A", 2, Some(101.0)),
      ("A", 3, None),
      ("B", 4, Some(200.0))))
  }

  test("null payload in the matched right row is NOT replaced by a stale older value") {
    val trades = frame(
      Seq(StructField("sym", StringType), StructField("t", TimestampType)),
      Seq(Row("A", ts(30))))
    val quotes = frame(
      Seq(StructField("sym", StringType), StructField("qt", TimestampType),
        StructField("px", DoubleType)),
      Seq(
        Row("A", ts(10), 100.0),
        Row("A", ts(20), null))) // matched row carries NULL px
    val out = AsOf.asofJoinBackward(
      trades, quotes, "t", "qt", by = Seq("sym"), payload = Seq("qt", "px"))
      .collect().head
    // matched row is ts(20): its qt travels AND its null px is kept
    assert(out.getAs[Timestamp]("qt") == ts(20))
    assert(out.isNullAt(out.fieldIndex("px")))
  }

  test("tolerance nulls matches farther than the gap, both directions") {
    val left = frame(
      Seq(StructField("k", StringType), StructField("t", LongType),
        StructField("n", IntegerType)),
      Seq(Row("A", 100L, 1), Row("A", 200L, 2), Row("A", 310L, 3)))
    val right = frame(
      Seq(StructField("k", StringType), StructField("rt", LongType),
        StructField("v", DoubleType)),
      Seq(Row("A", 95L, 1.0), Row("A", 300L, 3.0)))
    val back = AsOf.asofJoinBackward(left, right, "t", "rt",
      by = Seq("k"), payload = Seq("v"), tolerance = Some(10L))
      .collect().map(r => r.getAs[Int]("n") ->
        Option(r.getAs[java.lang.Double]("v")).map(_.toDouble)).toMap
    // n=1: rt 95, gap 5 <= 10 -> kept; n=2: nearest rt 95, gap 105 -> null
    // n=3: rt 300, gap 10 -> kept (inclusive)
    assert(back === Map(1 -> Some(1.0), 2 -> None, 3 -> Some(3.0)))
    val fwd = AsOf.asofJoinForward(left, right, "t", "rt",
      by = Seq("k"), payload = Seq("v"), tolerance = Some(100L))
      .collect().map(r => r.getAs[Int]("n") ->
        Option(r.getAs[java.lang.Double]("v")).map(_.toDouble)).toMap
    // n=1: next rt 300, gap 200 -> null; n=2: rt 300, gap 100 -> kept
    // n=3: no right row at/after 310 -> null
    assert(fwd === Map(1 -> None, 2 -> Some(3.0), 3 -> None))
  }

  test("nearest as-of picks the smaller gap either direction, ties backward") {
    val lSchema = Seq(StructField("k", StringType),
      StructField("t", LongType), StructField("n", IntegerType))
    val rSchema = Seq(StructField("k", StringType),
      StructField("rt", LongType), StructField("v", StringType))
    val left = frame(lSchema, Seq(
      Row("A", 10L, 1), // quotes at 7 (gap 3) and 12 (gap 2) -> fwd "q12"
      Row("A", 6L, 2),  // gaps 1 back / 6 fwd -> "q7"
      Row("A", 9L, 3),  // gaps 2 back / 3 fwd -> "q7"
      Row("B", 5L, 4),  // only a later quote at 8 -> "q8"
      Row("C", 5L, 5))) // no quotes at all -> null
    val right = frame(rSchema, Seq(
      Row("A", 7L, "q7"), Row("A", 12L, "q12"), Row("B", 8L, "q8")))
    val out = AsOf.asofJoinNearest(
      left, right, "t", "rt", by = Seq("k"), payload = Seq("v"))
      .collect()
      .map(r => r.getAs[Int]("n") -> Option(r.getAs[String]("v"))).toMap
    assert(out === Map(1 -> Some("q12"), 2 -> Some("q7"), 3 -> Some("q7"),
      4 -> Some("q8"), 5 -> None))

    // exact tie: left at 9 with quotes at 7 and 11 -> backward wins
    val tieL = frame(lSchema, Seq(Row("A", 9L, 1)))
    val tieR = frame(rSchema, Seq(Row("A", 7L, "back"), Row("A", 11L, "fwd")))
    val tie = AsOf.asofJoinNearest(
      tieL, tieR, "t", "rt", by = Seq("k"), payload = Seq("v"))
      .collect().head.getAs[String]("v")
    assert(tie === "back")

    // equal-timestamp right row is a gap-0 backward match
    val eqR = frame(rSchema, Seq(Row("A", 9L, "same"), Row("A", 10L, "later")))
    val eq = AsOf.asofJoinNearest(
      tieL, eqR, "t", "rt", by = Seq("k"), payload = Seq("v"))
      .collect().head.getAs[String]("v")
    assert(eq === "same")
  }

  test("nearest tolerance bounds |gap|; both window carries share one exchange") {
    val lSchema = Seq(StructField("k", StringType),
      StructField("t", LongType), StructField("n", IntegerType))
    val rSchema = Seq(StructField("k", StringType),
      StructField("rt", LongType), StructField("v", StringType))
    val left = frame(lSchema, Seq(Row("A", 10L, 1), Row("A", 100L, 2)))
    val right = frame(rSchema, Seq(Row("A", 13L, "near"), Row("A", 90L, "far")))
    val joined = AsOf.asofJoinNearest(
      left, right, "t", "rt", by = Seq("k"), payload = Seq("v"),
      tolerance = Some(5L))
    // inspect the plan BEFORE execution: a collected AQE plan prints
    // final + initial trees and would double-count the one exchange
    val planStr = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(k#".r.findAllIn(planStr).size
    assert(exchanges === 1,
      s"nearest as-of must shuffle once, got:\n$planStr")
    assert("\\bWindow\\b".r.findAllIn(planStr).size === 1,
      s"both carries must share ONE Window node:\n$planStr")
    val out = joined.collect()
      .map(r => r.getAs[Int]("n") -> Option(r.getAs[String]("v"))).toMap
    assert(out === Map(1 -> Some("near"), 2 -> None)) // |100-90|=10 > 5
    intercept[IllegalArgumentException] {
      AsOf.asofJoinNearest(
        frame(Seq(StructField("k", StringType),
          StructField("t", TimestampType)), Seq(Row("A", ts(1)))),
        right, "t", "rt", by = Seq("k"), payload = Seq("v"))
    }
  }

  test("tolerance rejects non-integral time columns and negative gaps") {
    val left = frame(
      Seq(StructField("k", StringType), StructField("t", TimestampType)),
      Seq(Row("A", ts(1))))
    val right = frame(
      Seq(StructField("k", StringType), StructField("rt", TimestampType),
        StructField("v", DoubleType)),
      Seq(Row("A", ts(0), 1.0)))
    intercept[IllegalArgumentException] {
      AsOf.asofJoinBackward(left, right, "t", "rt",
        by = Seq("k"), payload = Seq("v"), tolerance = Some(10L))
    }
    val longLeft = frame(
      Seq(StructField("k", StringType), StructField("t", LongType)),
      Seq(Row("A", 1L)))
    val longRight = frame(
      Seq(StructField("k", StringType), StructField("rt", LongType),
        StructField("v", DoubleType)),
      Seq(Row("A", 0L, 1.0)))
    intercept[IllegalArgumentException] {
      AsOf.asofJoinBackward(longLeft, longRight, "t", "rt",
        by = Seq("k"), payload = Seq("v"), tolerance = Some(-1L))
    }
    // the tolerance path packs the matched right time under __rt
    // inside the payload struct — a real payload column of that name
    // would collide (duplicate struct field); reserved, like
    // Winnow/Chunking's reserved columns
    val rtRight = frame(
      Seq(StructField("k", StringType), StructField("rt", LongType),
        StructField("__rt", DoubleType)),
      Seq(Row("A", 0L, 1.0)))
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoinBackward(longLeft, rtRight, "t", "rt",
        by = Seq("k"), payload = Seq("__rt"), tolerance = Some(10L))
    }
    assert(e.getMessage.contains("__rt"))
  }
}
