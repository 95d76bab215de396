package graft.ann

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** JL projection: sign-matrix formula parity, hand-computed
  * projection, quantization exactness, the null contract on dim
  * mismatch, and the distortion concentration the lemma promises.
  */
class JlSpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v) }, 3),
      StructType(Seq(StructField("id", LongType),
        StructField("v", ArrayType(FloatType)))))

  test("Scala sign formula equals the SQL md5-parity rendering") {
    // the oracle derives signs IN SQL; the Spark path embeds
    // Scala-computed ones — they must be the same function
    val pairs = for (j <- 0 until 4; i <- 1 to 8) yield (j, i)
    val sqlSigns = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map { case (j, i) => Row(j, i) }, 2),
      StructType(Seq(StructField("j", IntegerType), StructField("i", IntegerType))))
      .selectExpr("j", "i",
        """CAST(CASE WHEN CAST(conv(substr(md5(cast(concat('jl:', j, ':', i) as binary)),
          |  1, 15), 16, 10) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS BIGINT) AS s"""
          .stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((j, i) <- pairs)
      assert(Jl.signValue(j, i) == sqlSigns((j, i)), s"sign($j,$i)")
  }

  test("hand-computed projection with exact quantization") {
    // 1.0 and -0.5 quantize exactly (multiples of 2^-20)
    val s1 = Jl.signValue(0, 1)
    val s2 = Jl.signValue(0, 2)
    val got = Jl.project(frame(Seq((7L, Seq(1.0f, -0.5f)))),
      "id", "v", outDims = 1, dim = 2).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 1048576L * s1 - 524288L * s2)
  }

  test("dim mismatch yields NULL y, never a truncated projection") {
    val got = Jl.project(frame(Seq((1L, Seq(1.0f)))),
      "id", "v", outDims = 2, dim = 3).collect()
    assert(got.forall(_.isNullAt(2)))
  }

  test("projection is partition-independent and deterministic") {
    val rows = (0L until 40L).map(i =>
      (i, (1 to 16).map(d => ((i * 31 + d * 17) % 41 - 20) / 20.0f)))
    val a = Jl.project(frame(rows), "id", "v", 4, 16)
      .orderBy("id", "j").collect().map(_.toSeq)
    val b = Jl.project(frame(rows).repartition(11), "id", "v", 4, 16)
      .orderBy("id", "j").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("distortion census: duplicates land in band -1, mass concentrates") {
    val rows = (0L until 30L).map(i =>
      (i, (1 to 64).map(d =>
        (((i * 131 + d * 37) % 101).toFloat - 50f) / 160f))) ++
      Seq((1000L, (1 to 64).map(_ => 0.1f)), // duplicate pair
        (1001L, (1 to 64).map(_ => 0.1f)))
    val census = Jl.distortionCensus(frame(rows), "id", "v", 16, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census.getOrElse(-1L, 0L) == 1L) // exactly the planted dup
    val total = census.values.sum
    val nearOne = census.filter { case (b, _) => b >= 4 && b <= 25 }
      .values.sum
    assert(nearOne * 10 >= total * 8,
      s"distortion not concentrated: $census") // >= 80% within [0.4, 2.5]
  }

  test("the all-pairs guard raises above maxRows") {
    val rows = (0L until 10L).map(i => (i, Seq(0.5f, 0.5f)))
    val ex = intercept[Exception] {
      Jl.distortionCensus(frame(rows), "id", "v", 2, 2, maxRows = 5)
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
