package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ChecksumSpec extends AnyFunSuite with SparkSpec {

  private def frame(parts: Int, rows: (java.lang.Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, s) => Row(k, s) }, parts),
      StructType(Seq(StructField("k", LongType), StructField("s", StringType))))

  private def sum(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val r = Checksum.checksum(df, Seq("k", "s")).collect().head
    (r.getLong(0), r.getString(1))
  }

  test("checksum is independent of row order and partitioning") {
    val rows: Seq[(java.lang.Long, String)] =
      (1L to 500L).map(i => (java.lang.Long.valueOf(i), "v" + (i % 37)))
    val a = sum(frame(2, rows: _*))
    val b = sum(frame(13, rows.reverse: _*))
    assert(a === b)
    assert(a._1 === 500L)
  }

  test("a single changed row changes the checksum; a swapped pair does not") {
    val base = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, "c")).map { case (k, s) => (java.lang.Long.valueOf(k), s) }
    val changed = base.updated(2, (java.lang.Long.valueOf(3L), "C"))
    assert(sum(frame(1, base: _*)) !== sum(frame(1, changed: _*)))
    assert(sum(frame(1, base: _*)) === sum(frame(1, base.reverse: _*)))
  }

  test("null position matters: (null, x) differs from (x, null)") {
    val a = sum(frame(1, (null.asInstanceOf[java.lang.Long], "x")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(java.lang.Long.valueOf(1L), null)), 1),
      StructType(Seq(StructField("k", LongType), StructField("s", StringType))))
    val b = {
      val r = Checksum.checksum(df, Seq("k", "s")).collect().head
      (r.getLong(0), r.getString(1))
    }
    assert(a._2 !== b._2)
  }

  test("encoding is injective: no cross-column aliasing") {
    // ("1|a", "b") must differ from ("1", "a|b") — a separator-joined
    // digest would alias them
    def two(x: String, y: String) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(x, y)), 1),
        StructType(Seq(StructField("a", StringType), StructField("b", StringType))))
      Checksum.checksum(df, Seq("a", "b")).collect().head.getString(1)
    }
    assert(two("1|a", "b") !== two("1", "a|b"))
    // and a literal U+0001 value must differ from NULL
    assert(two("\u0001", "x") !== {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(null, "x")), 1),
        StructType(Seq(StructField("a", StringType), StructField("b", StringType))))
      Checksum.checksum(df, Seq("a", "b")).collect().head.getString(1)
    })
  }

  test("digest algorithm pinned: matches a hand-computed md5 token sum") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def rowDigest(vals: Seq[Option[String]]): BigInt = {
      val tokens = vals.map { case None => "0"; case Some(v) => "1" + md5hex(v) }
      BigInt(md5hex(tokens.mkString).take(15), 16)
    }
    val rows = Seq[(java.lang.Long, String)](
      (java.lang.Long.valueOf(1L), "a"), (java.lang.Long.valueOf(2L), "b"))
    val expected =
      rowDigest(Seq(Some("1"), Some("a"))) + rowDigest(Seq(Some("2"), Some("b")))
    assert(sum(frame(1, rows: _*)) === ((2L, expected.toString)))
  }
}
