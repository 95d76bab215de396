package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BootstrapSpec extends AnyFunSuite with SparkSpec {

  private def vals(n: Int, parts: Int = 4): DataFrame = {
    val rows = (0 until n).map(i => Row(i.toLong, (i % 100).toLong))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("x", LongType, nullable = false))))
  }

  test("PoisCum is the floored cumulative Poisson(1) CDF") {
    // independent reference: P(X<=k) = e^-1 * sum_{j<=k} 1/j!
    var fact = 1.0
    var cum = 0.0
    val want = (0 to 8).map { k =>
      if (k > 0) fact *= k
      cum += math.exp(-1.0) / fact
      math.floor(cum * 1e6).toLong
    }
    assert(Bootstrap.PoisCum === want)
    assert(Bootstrap.PoisCum.head === 367879L) // e^-1
    assert(Bootstrap.PoisCum.last >= 999998L)  // P(X>8) < 2e-6
  }

  test("resample weights reproduce Poisson(1): n_eff ~ n and means bracket the truth") {
    val df = vals(5000)
    val got = Bootstrap.resampleMeans(df, "id", "x", b = 32).collect()
    assert(got.length === 32)
    val trueMeanMicro = (0 until 5000).map(i => (i % 100).toLong).sum * 1000000L / 5000L
    val means = got.map(_.getAs[Long]("mean_micro"))
    // every resample mean within 5% of truth; the spread is nonzero
    // (resamples genuinely differ) and the truth sits inside the range
    means.foreach(m => assert(math.abs(m - trueMeanMicro) < trueMeanMicro / 20))
    assert(means.distinct.length > 1)
    assert(means.min <= trueMeanMicro && trueMeanMicro <= means.max)
    // Poisson(1) multiplicities: each resample's effective n near n
    got.map(_.getAs[Long]("n_eff"))
      .foreach(n => assert(math.abs(n - 5000L) < 300L, s"n_eff $n"))
  }

  test("cluster bootstrap: within-cluster rows share the weight, spread exceeds row bootstrap") {
    // 10 clusters with strongly cluster-correlated values: cluster c's
    // rows all carry value c*10 — between-cluster variance dominates
    val rows = (0 until 2000).map { i =>
      val c = i % 10
      Row(i.toLong, s"src$c", (c * 10).toLong)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("src", StringType, nullable = false),
        StructField("x", LongType, nullable = false))))
    def spread(keyCol: String): Long = {
      val m = Bootstrap.resampleMeans(df, keyCol, "x", b = 32)
        .collect().map(_.getAs[Long]("mean_micro"))
      m.max - m.min
    }
    // resampling whole clusters must show the between-cluster
    // variance the row bootstrap averages away (design effect = 200)
    assert(spread("src") > 4L * spread("id"),
      s"cluster spread ${spread("src")} vs row spread ${spread("id")}")
  }

  test("deterministic and partitioning-independent") {
    val a = Bootstrap.resampleMeans(vals(2000, 4), "id", "x", b = 8)
      .orderBy("b").collect().map(_.toSeq)
    val b = Bootstrap.resampleMeans(vals(2000, 17), "id", "x", b = 8)
      .orderBy("b").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
