package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.ZInterleave.z_interleave

class ZInterleaveSpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: (Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) => Row(a, b) }, 2),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))

  private def zs(df: org.apache.spark.sql.DataFrame, bits: Int) =
    df.select(z_interleave(col("a"), col("b"), bits)).collect().map(_.getLong(0))

  test("known interleavings") {
    // a=0b11, b=0b00 -> even positions set: 0b0101 = 5
    assert(zs(frame((3L, 0L)), 4).head === 5L)
    // a=0b00, b=0b11 -> odd positions: 0b1010 = 10
    assert(zs(frame((0L, 3L)), 4).head === 10L)
    // a=1, b=1 -> 0b11 = 3
    assert(zs(frame((1L, 1L)), 4).head === 3L)
    assert(zs(frame((0L, 0L)), 16).head === 0L)
  }

  test("interleave is a bijection on the masked domain") {
    val rows = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val out = zs(frame(rows: _*), 5)
    assert(out.distinct.length === 1024)
    assert(out.max === 1023L && out.min === 0L)
  }

  test("inputs are masked to the low bits") {
    assert(zs(frame((1024L + 3L, 0L)), 5).toSeq === zs(frame((3L, 0L)), 5).toSeq)
  }

  test("z-order locality: nearby cells share high bits (prefix blocks)") {
    // the 4 cells of the 2x2 block at (0..1, 0..1) occupy z 0..3;
    // the block at (2..3, 2..3) occupies z 12..15 — disjoint ranges
    val block0 = for (a <- 0L to 1L; b <- 0L to 1L) yield (a, b)
    val block1 = for (a <- 2L to 3L; b <- 2L to 3L) yield (a, b)
    assert(zs(frame(block0: _*), 4).toSet === Set(0L, 1L, 2L, 3L))
    assert(zs(frame(block1: _*), 4).toSet === Set(12L, 13L, 14L, 15L))
  }

  test("interpreted eval matches codegen") {
    val rows = (0L until 200L).map(i => (i * 37L % 1024L, i * 91L % 1024L))
    val viaCodegen = zs(frame(rows: _*), 10)
    val viaEval = rows.map { case (a, b) =>
      ZInterleave(org.apache.spark.sql.catalyst.expressions.Literal(a),
        org.apache.spark.sql.catalyst.expressions.Literal(b), 10)
        .eval(null).asInstanceOf[Long]
    }
    assert(viaCodegen.toSeq === viaEval.toSeq)
  }

  test("SQL rendering matches the expression on spark.sql itself") {
    val sql = ZInterleave.zInterleaveSql("a", "b", 6)
    val df = frame((0L until 64L).map(i => (i, 63L - i)): _*)
    df.createOrReplaceTempView("zt")
    val viaSql = spark.sql(s"SELECT $sql AS z FROM zt ORDER BY a")
      .collect().map(_.getLong(0))
    val direct = df.orderBy("a").select(z_interleave(col("a"), col("b"), 6))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq === direct.toSeq)
  }

  test("SQL registration works") {
    ZInterleave.register(spark)
    val got = spark.sql("SELECT z_interleave(3L, 0L, 4) AS z").collect().head.getLong(0)
    assert(got === 5L)
  }
}
