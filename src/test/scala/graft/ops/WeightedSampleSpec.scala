package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class WeightedSampleSpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: (Long, Double)*) = // (id, rate)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, r) => Row(i, r) }, 3),
      StructType(Seq(StructField("id", LongType), StructField("rate", DoubleType))))

  test("rate 1 keeps everything, rate 0 drops everything") {
    val all = frame((1L to 100L).map(i => (i, 1.0)): _*)
    assert(Sampling.weightedSample(all, "id", "rate").count() === 100L)
    val none = frame((1L to 100L).map(i => (i, 0.0)): _*)
    assert(Sampling.weightedSample(none, "id", "rate").count() === 0L)
  }

  test("kept fraction tracks the per-row rate") {
    val df = frame((1L to 4000L).map(i => (i, if (i % 2 == 0) 0.8 else 0.2)): _*)
    val kept = Sampling.weightedSample(df, "id", "rate", seed = 7L)
      .groupBy(col("id") % 2).count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(math.abs(kept(0L) - 1600L) < 120, kept.toString) // 2000*0.8
    assert(math.abs(kept(1L) - 400L) < 120, kept.toString)  // 2000*0.2
  }

  test("membership equals hashSample when the rate column is constant") {
    val ids = frame((1L to 500L).map(i => (i, 0.3)): _*)
    val viaWeighted = Sampling.weightedSample(ids, "id", "rate", seed = 5L)
      .select("id").collect().map(_.getLong(0)).toSet
    val viaHash = Sampling.hashSample(ids, "id", 0.3, seed = 5L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaWeighted === viaHash)
  }

  test("membership is growth-stable: adding rows never flips earlier decisions") {
    val small = frame((1L to 200L).map(i => (i, 0.5)): _*)
    val big = frame((1L to 1000L).map(i => (i, 0.5)): _*)
    val keptSmall = Sampling.weightedSample(small, "id", "rate").select("id")
      .collect().map(_.getLong(0)).toSet
    val keptBig = Sampling.weightedSample(big, "id", "rate").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(keptSmall === keptBig.filter(_ <= 200L))
  }
}
