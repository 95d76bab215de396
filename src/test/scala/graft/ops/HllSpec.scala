package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** HLL: duplicate-blindness, shard-merge law, rho layout, and the
  * estimator's accuracy against the exact distinct count.
  */
class HllSpec extends AnyFunSuite with SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  test("registers are duplicate-blind: dup-heavy input = distinct input") {
    import spark.implicits._
    val vals = (1 to 500).map(_.toLong)
    val dups = vals ++ vals ++ vals
    val a = Hll.registerFrame(dups.toDF("v"), "v").collect().toSet
    val b = Hll.registerFrame(vals.toDF("v"), "v").collect().toSet
    assert(a == b)
  }

  test("mergeRegisters over shards equals registers over the union") {
    import spark.implicits._
    val l = (1 to 400).map(_.toLong).toDF("v")
    val r = (200 to 700).map(_.toLong).toDF("v")
    val merged = Hll.mergeRegisters(
      Hll.registerFrame(l, "v"), Hll.registerFrame(r, "v"))
    val whole = Hll.registerFrame(
      ((1 to 400) ++ (200 to 700)).map(_.toLong).toDF("v"), "v")
    assert(merged.collect().toSet == whole.collect().toSet)
  }

  test("rho layout: bucket = top 8 hash bits, rho = 53 - bitlen(rem)") {
    import spark.implicits._
    val row = Hll.registerFrame(Seq(42L).toDF("v"), "v").head()
    // independent recomputation of the md5-derived 60-bit hash
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("42".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(md.take(15), 16)
    val rem = h & 4503599627370495L
    val expectRho =
      if (rem == 0) 53 else 53 - java.lang.Long.toBinaryString(rem).length
    assert(row.getLong(0) == (h >>> 52))
    assert(row.getInt(1) == expectRho)
  }

  test("estimate lands within 3 standard errors of the exact count") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val exact = li.select("l_orderkey").distinct().count().toDouble
    val est = Hll.distinctEstimate(li, "l_orderkey").head().getDouble(3)
    // m=256 → relative standard error 1.04/16 = 6.5%
    assert(math.abs(est - exact) / exact < 0.195,
      s"est $est vs exact $exact")
  }

  test("empty input estimates through the all-zero register path") {
    import spark.implicits._
    val out = Hll.distinctEstimate(
      Seq.empty[Long].toDF("v"), "v").head()
    assert(out.getInt(0) == 0 && out.getInt(1) == 256)
    assert(out.getLong(2) == 256L * 9007199254740992L)
  }
}
