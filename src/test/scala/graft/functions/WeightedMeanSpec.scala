package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.WeightedMean.weighted_mean

class WeightedMeanSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions.col

  test("weighted_mean aggregates with map-side-mergeable buffers") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", 10.0, 1.0), Row("a", 20.0, 3.0),
        Row("b", 5.0, 2.0), Row("b", 0.0, 0.0)), 3),
      StructType(Seq(
        StructField("k", StringType), StructField("v", DoubleType),
        StructField("w", DoubleType))))
    val out = df.groupBy(col("k"))
      .agg(weighted_mean(col("v"), col("w")).as("wm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == (10.0 * 1 + 20.0 * 3) / 4.0)
    assert(out("b") == 5.0)

    // empty weights -> 0
    val zero = df.filter(col("w") === 0.0)
      .agg(weighted_mean(col("v"), col("w"))).collect().head.getDouble(0)
    assert(zero == 0.0)
  }
}
