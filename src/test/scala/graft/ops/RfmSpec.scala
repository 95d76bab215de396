package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RfmSpec extends AnyFunSuite with SparkSpec {

  private val day = 86400L * 1000000000L

  // (user, ts_days, value) -> events rows with ns timestamps
  private def frame(rows: (Long, Long, Double)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (u, td, v) => Row(u, td * day, v) }, 3),
      StructType(Seq(StructField("user_id", LongType),
        StructField("ts", LongType), StructField("value", DoubleType))))

  private def run(df: org.apache.spark.sql.DataFrame) =
    Rfm.rfm(df, "user_id", "ts", "value").orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))

  test("quartiles are fixed-width bins over exact global ranks") {
    // 4 users; ranks split one per quartile in each dimension
    val got = run(frame(
      (1L, 10L, 40.0),                     // most recent, 1 event, 40
      (2L, 9L, 10.0), (2L, 8L, 20.0),      // 2 events, 30
      (3L, 5L, 5.0), (3L, 4L, 5.0), (3L, 3L, 10.0), // 3 events, 20
      (4L, 1L, 2.5), (4L, 1L, 2.5), (4L, 0L, 2.5), (4L, 0L, 2.5))) // 4 ev, 10
    // recency: u1=0d rank1, u2=1d, u3=5d, u4=9d -> r_q 1..4
    // frequency desc: u4(4) rank1, u3(3), u2(2), u1(1) -> f_q u4=1..u1=4
    // monetary desc: u1(40) rank1 ... u4(10) rank4
    assert(got.toSeq === Seq(
      (1L, 0L, 1L, 40.0, 1, 4, 1, 141),
      (2L, 1L, 2L, 30.0, 2, 3, 2, 232),
      (3L, 5L, 3L, 20.0, 3, 2, 3, 323),
      (4L, 9L, 4L, 10.0, 4, 1, 4, 414)))
  }

  test("ties break by user id; result independent of input partitioning") {
    val rows = (1L to 17L).map(u => (u, 5L, 1.0)) // all metrics equal
    val a = run(frame(rows: _*))
    val b = run(frame(scala.util.Random.javaRandomToRandom(
      new java.util.Random(3)).shuffle(rows): _*))
    assert(a.toSeq === b.toSeq)
    // equal metrics -> quartile = position of user id order: 17 users,
    // bins of ceil-ish width: ranks 1..17 -> ((rk-1)*4) div 17 + 1
    val want = (1L to 17L).map(u => (((u - 1) * 4) / 17 + 1).toInt)
    assert(a.map(_._5).toSeq === want)
    assert(a.map(_._6).toSeq === want)
    assert(a.map(_._7).toSeq === want)
  }

  test("monetary is the exact decimal sum rendered as double") {
    val got = run(frame((1L, 0L, 0.1), (1L, 0L, 0.2), (2L, 0L, 1.0)))
    assert(got(0)._4 === 0.3) // decimal path: exactly 0.3, not 0.30000000000000004
  }

  test("sketch twin agrees with exact-rank quartiles on separated metrics") {
    // 8 users with widely separated recency/frequency/monetary (no
    // value within 2^-5 relative distance of a quartile boundary), so
    // the sketch's boundary-grade bins must equal the exact ranks'
    val rows = (0 until 8).flatMap { u =>
      val uid = u + 1L
      // recency: user u last active at day 100 - 10u; frequency: u+1
      // events; monetary: (u+1)*1000 spread over the events
      (0 to u).map(i => (uid, (100L - 10L * u) - 0L,
        1000.0 * (u + 1) / (u + 1))) :+
        ((uid, 100L - 10L * u, 1000.0 * (u + 1) - (u + 1)))
    }
    val exact = run(frame(rows: _*))
    val sk = Rfm.rfmSketch(frame(rows: _*), "user_id", "ts", "value")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getInt(4), r.getInt(5), r.getInt(6)))
    val ex = exact.map(r => (r._1, r._5, r._6, r._7))
    assert(sk.toSeq === ex.toSeq, s"sketch ${sk.toSeq} vs exact ${ex.toSeq}")
  }
}
