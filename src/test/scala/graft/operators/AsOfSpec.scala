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
}
