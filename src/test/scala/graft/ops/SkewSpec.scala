package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkewSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions._

  test("salted join equals plain join on skewed keys") {
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))

    val plain = lineitem.join(orders, Seq("l_orderkey"), "inner")
    val salted = Skew.saltedJoin(lineitem, orders, "l_orderkey", saltFactor = 8)

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain.select(salted.columns.map(col): _*)).isEmpty)
  }
}
