package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SamplingSpec extends AnyFunSuite with SparkSpec {

  private def ids(n: Int, parts: Int = 4): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, if (i % 3 == 0) "en" else "de"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("lang", StringType, nullable = false))))
  }

  test("hashSample keeps ~fraction, deterministically, regardless of partitioning") {
    val a = Sampling.hashSample(ids(10000, 4), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids(10000, 17), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample depends on partitioning")
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02, s"fraction off: ${a.size}")
  }

  test("membership is stable when the corpus grows (no split contamination)") {
    val small = Sampling.hashSample(ids(1000), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(ids(10000), "id", 0.25)
      .collect().map(_.getLong(0)).toSet.filter(_ < 1000)
    assert(small == large, "membership changed when rows were appended")
  }

  test("withSplit covers every row exactly once with ~testFraction in test") {
    val d = Sampling.withSplit(ids(10000), "id", 0.2)
    assert(d.count() == 10000)
    val byId = d.collect().map(r => r.getLong(0) -> r.getAs[String]("split"))
    assert(byId.length == byId.map(_._1).distinct.length)
    val testN = byId.count(_._2 == "test")
    assert(math.abs(testN / 10000.0 - 0.2) < 0.02, s"test fraction off: $testN")
    // different seed -> different membership (not a constant function)
    val other = Sampling.withSplit(ids(10000), "id", 0.2, seed = 7L)
      .filter(col("split") === "test").collect().map(_.getLong(0)).toSet
    val mine = byId.filter(_._2 == "test").map(_._1).toSet
    assert(other != mine)
  }

  test("stratifiedSample applies per-stratum fractions with default fallback") {
    val d = ids(9000) // 3000 en, 6000 de
    val out = Sampling.stratifiedSample(d, "lang", "id",
      Map("en" -> 0.1), defaultFraction = 0.8)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("en") / 3000.0 - 0.1) < 0.03, s"en: ${out("en")}")
    assert(math.abs(out("de") / 6000.0 - 0.8) < 0.03, s"de: ${out("de")}")
  }

  test("temperatureWeights: weights normalize, rare groups upsample, alpha=1 is natural") {
    // ids(): lang 'en' for every third row -> shares 1/3 en, 2/3 de
    val w05 = Sampling.temperatureWeights(ids(9000), "lang", alpha = 0.5)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("weight"), r.getAs[Double]("upsample"))).toMap
    assert(w05("en")._1 == 3000 && w05("de")._1 == 6000)
    assert(math.abs(w05.values.map(_._2).sum - 1.0) < 1e-12, "weights must sum to 1")
    // sqrt flattens: en (share 1/3) gets weight sqrt(1/3)/(sqrt(1/3)+sqrt(2/3)) ~ 0.4142
    assert(math.abs(w05("en")._2 - (math.sqrt(1.0 / 3) /
      (math.sqrt(1.0 / 3) + math.sqrt(2.0 / 3)))) < 1e-9)
    assert(w05("en")._3 > 1.0 && w05("de")._3 < 1.0,
      "rare group must upsample, dominant must downsample")
    // alpha = 1 keeps the natural distribution: weight == share
    val w1 = Sampling.temperatureWeights(ids(9000), "lang", alpha = 1.0)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("weight"), r.getAs[Double]("upsample"))).toMap
    assert(math.abs(w1("en")._1 - 1.0 / 3) < 1e-9)
    assert(math.abs(w1("en")._2 - 1.0) < 1e-9 && math.abs(w1("de")._2 - 1.0) < 1e-9)
  }

  test("temperatureWeights is partition-independent (integer-quantized normalizer)") {
    // the 1e15 quantization makes the normalizer an exact integer sum,
    // so results are bit-identical however the input is partitioned
    def run(parts: Int) = Sampling.temperatureWeights(ids(5000, parts), "lang")
      .collect().map(r => (r.getString(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(run(3) == run(19))
  }

  test("temperatureWeights rejects alpha outside (0,1] and reserved columns") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(ids(10), "lang", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(ids(10), "lang", alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(
        ids(10).withColumn("__share", lit(1)), "lang")
    }
  }

  test("fractions outside [0,1] are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.hashSample(ids(10), "id", 1.5)
    }
  }

  test("sampleExactK keeps exactly min(k, n) per group, partition-independent") {
    val k = 5
    val got = Sampling.sampleExactK(ids(300, 4), "lang", "id", k, seed = 7L)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val again = Sampling.sampleExactK(ids(300, 13), "lang", "id", k, seed = 7L)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got === again, "selection depends on partitioning")
    assert(got.count(_._1 == "en") === k)
    assert(got.count(_._1 == "de") === k)
    // a group smaller than k keeps all rows
    val tiny = Sampling.sampleExactK(ids(6, 2), "lang", "id", 100)
    assert(tiny.count() === 6)
  }

  test("sampleExactK agrees with the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val df = ids(400, 5)
    val k = 7; val seed = 11L
    val viaTopK = Sampling.sampleExactK(df, "lang", "id", k, seed)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val w = Window.partitionBy(col("lang"))
      .orderBy(Sampling.bucket(col("id"), seed), col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(viaTopK === viaWindow)
  }

  test("sampleExactK selection for k is a prefix of the selection for 2k") {
    val df = ids(400, 3)
    val small = Sampling.sampleExactK(df, "lang", "id", 4, seed = 5L)
      .collect().map(_.getLong(0)).toSet
    val large = Sampling.sampleExactK(df, "lang", "id", 8, seed = 5L)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large), "growing the budget removed rows")
    // and a different seed picks a different set
    val other = Sampling.sampleExactK(df, "lang", "id", 4, seed = 6L)
      .collect().map(_.getLong(0)).toSet
    assert(small !== other)
  }

  test("sampleSkewAudit: counts reconcile and ppm deltas are near zero for a hash sample") {
    import org.apache.spark.sql.functions._
    val df = spark.range(3000)
      .select(col("id"), (col("id") % 3).cast("string").as("cat"))
    val got = Sampling.sampleSkewAudit(df, "id", "cat", fraction = 0.3)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    assert(got.values.map(_._1).sum == 3000L)
    val sampTotal = got.values.map(_._2).sum
    assert(math.abs(sampTotal - 900L) < 100L, s"sample size $sampTotal")
    // the category is id % 3 while the sample keys on md5(id) — no
    // correlation, so every share delta stays within noise (< 3%)
    got.foreach { case (c, (_, _, d)) =>
      assert(math.abs(d) < 30000L, s"cat $c delta_ppm $d")
    }
    // a sample KEYED ON the category itself is the pathology the
    // audit exists to catch: whole categories land in or out
    // together (here cats 0 and 9 pass the 0.3 threshold), so their
    // shares inflate to ~500000 ppm while the rest read zero
    val wide = spark.range(3000)
      .select(col("id"), (col("id") % 10).cast("string").as("cat"))
    val biased = Sampling.sampleSkewAudit(wide, "cat", "cat", 0.3)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(biased.values.exists(d => math.abs(d) > 100000L),
      s"biased sample not flagged: $biased")
  }
}
