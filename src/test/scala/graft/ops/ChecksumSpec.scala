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

  test("canonical: doubles quantize engine-exactly, specials get fixed tokens") {
    import org.apache.spark.sql.functions.col
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(java.lang.Double.valueOf(3.14159), java.lang.Long.valueOf(1L)),
        Row(java.lang.Double.valueOf(-2.5000004), java.lang.Long.valueOf(2L)),
        Row(java.lang.Double.valueOf(Double.NaN), java.lang.Long.valueOf(3L)),
        Row(java.lang.Double.valueOf(Double.PositiveInfinity), java.lang.Long.valueOf(4L)),
        Row(java.lang.Double.valueOf(Double.NegativeInfinity), java.lang.Long.valueOf(5L)),
        Row(java.lang.Double.valueOf(1.0e300), java.lang.Long.valueOf(6L)),
        Row(null, java.lang.Long.valueOf(7L))), 2),
      StructType(Seq(StructField("v", DoubleType), StructField("id", LongType))))
    val got = df.select(col("id"),
        Checksum.canonical(col("v"), DoubleType).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // 3.14159 is the value glibc/Java FORMATTERS disagree on; the IEEE
    // product rounds to exactly 3141590.0 on every engine (pinned vs
    // DuckDB: floor(least(greatest(3.14159*1e6, -9e18), 9e18)) = 3141590)
    assert(got(1L) === Some("3141590"))
    assert(got(2L) === Some("-2500001"))     // floor is toward -inf, not toward zero
    assert(got(3L) === Some("nan"))
    assert(got(4L) === Some("inf"))
    assert(got(5L) === Some("-inf"))
    assert(got(6L) === Some("9000000000000000000")) // clamp saturates
    assert(got(7L) === None)                 // null stays null (outer token handles it)
  }

  test("canonical timestamps/dates render as epoch micros/days") {
    import org.apache.spark.sql.functions.{col, to_date, to_timestamp, lit}
    val df = spark.range(1).select(
      to_timestamp(lit("2024-03-01 12:34:56.789")).as("ts"),
      to_date(lit("2024-03-01")).as("d"))
    val r = df.select(
      Checksum.canonical(col("ts"), TimestampType).as("ts"),
      Checksum.canonical(col("d"), DateType).as("d")).collect().head
    // pinned against DuckDB: epoch_us(TIMESTAMP '2024-03-01 12:34:56.789')
    // = 1709296496789000, DATE '2024-03-01' - DATE '1970-01-01' = 19783
    assert(r.getString(0) === "1709296496789000")
    assert(r.getString(1) === "19783")
    // NTZ (what parquet ms-timestamps read as) renders the same micros
    val ntz = spark.range(1)
      .select(col("id").cast("string").as("s"))
      .selectExpr("cast('2024-03-01 12:34:56.789' as timestamp_ntz) as ts")
    val rn = ntz.select(
      Checksum.canonical(col("ts"), TimestampNTZType).as("c")).collect().head
    assert(rn.getString(0) === "1709296496789000")
  }

  test("checksumCanonical is order/partitioning independent and change-sensitive") {
    def f(parts: Int, rows: Seq[(Double, Long)]) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (v, i) =>
          Row(java.lang.Double.valueOf(v), java.lang.Long.valueOf(i)) }, parts),
        StructType(Seq(StructField("v", DoubleType), StructField("id", LongType))))
      val r = Checksum.checksumCanonical(df, Seq("v", "id")).collect().head
      (r.getLong(0), r.getString(1))
    }
    val rows = (1L to 300L).map(i => (i * 0.37, i))
    assert(f(3, rows) === f(11, rows.reverse))
    // a sub-quantum perturbation is invisible; a super-quantum one is not
    val bumpedTiny = rows.updated(0, (rows(0)._1 + 1e-9, 1L))
    val bumpedReal = rows.updated(0, (rows(0)._1 + 1e-3, 1L))
    assert(f(3, rows)._2 === f(3, bumpedTiny)._2)
    assert(f(3, rows)._2 !== f(3, bumpedReal)._2)
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
