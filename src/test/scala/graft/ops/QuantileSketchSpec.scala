package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QuantileSketchSpec extends AnyFunSuite with SparkSpec {

  private def df(vs: Seq[Long]) = {
    import spark.implicits._
    vs.toDF("v")
  }

  private def cellMap(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    d.collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("cnt")).toMap

  test("small values bucket exactly; log buckets keep the top m+1 bits") {
    val m = 5
    val exact = 1L << (m + 1) // 64
    val c = QuantileSketch
      .cells(df(Seq(0L, 1L, 63L, 64L, 65L, 127L, 128L, 1000000L)), "v", m)
      .withColumn("lb", QuantileSketch.lowerBound(col("bucket"), m))
      .withColumn("ub", QuantileSketch.upperBound(col("bucket"), m))
      .collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("lb"), r.getAs[Long]("ub"))).toMap
    // exact range: bucket = value, zero-width envelope
    assert(c(0L) == (0L, 0L) && c(63L) == (63L, 63L))
    // 64 and 65 share exponent 6, shift 1: distinct buckets of width 2
    assert(c.contains(64L) && c(64L) == (64L, 65L))
    // every value lies inside its envelope, width/lb <= 2^-m
    c.foreach { case (b, (lb, ub)) =>
      assert(lb <= ub)
      if (b >= exact) assert((ub - lb + 1).toDouble / lb <= 1.0 / (1 << m))
    }
  }

  test("merge of two slices equals the whole-corpus sketch, cell for cell") {
    val vs = (0 until 5000).map(i => (i.toLong * 2654435761L) % 3000000L)
    val (a, b) = vs.splitAt(1777)
    val whole = cellMap(QuantileSketch.cells(df(vs), "v"))
    val merged = cellMap(QuantileSketch.merge(
      QuantileSketch.cells(df(a), "v"), QuantileSketch.cells(df(b), "v")))
    assert(merged == whole)
    // and the merged sketch answers quantiles identically
    val qw = QuantileSketch
      .quantiles(QuantileSketch.cells(df(vs), "v"), Seq(500, 990))
      .collect().map(r => r.getAs[Int]("q_permille") -> r.getAs[Long]("est_lb"))
    val qm = QuantileSketch.quantiles(QuantileSketch.merge(
        QuantileSketch.cells(df(a), "v"), QuantileSketch.cells(df(b), "v")),
        Seq(500, 990))
      .collect().map(r => r.getAs[Int]("q_permille") -> r.getAs[Long]("est_lb"))
    assert(qw.toMap == qm.toMap)
  }

  test("quantile envelope brackets the exact order statistic") {
    val m = 5
    val vs = (1 to 4000).map(i => (i.toLong * 48271L) % 10000000L)
    val sorted = vs.sorted
    val ans = QuantileSketch
      .quantiles(QuantileSketch.cells(df(vs), "v"), Seq(100, 500, 900, 999), m)
      .collect()
    assert(ans.length == 4)
    ans.foreach { r =>
      val rank = r.getAs[Long]("rank")
      val exactVal = sorted((rank - 1).toInt)
      val lb = r.getAs[Long]("est_lb")
      val ub = r.getAs[Long]("est_ub")
      assert(lb <= exactVal && exactVal <= ub,
        s"q=${r.getAs[Int]("q_permille")}: $exactVal outside [$lb, $ub]")
      // relative error of answering lb instead of the exact value
      if (exactVal > 0)
        assert((exactVal - lb).toDouble / exactVal <= 1.0 / (1 << m))
    }
  }

  test("per-group sketch matches per-group exact ranks") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => (s"g${i % 3}", (i.toLong * 69621L) % 500000L))
    val d = rows.toDF("g", "v")
    val ans = QuantileSketch.quantilesPerGroup(
      QuantileSketch.cellsPerGroup(d, "g", "v"), Seq(500))
      .collect()
    assert(ans.length == 3)
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    ans.foreach { r =>
      val g = r.getAs[String]("g")
      val rank = r.getAs[Long]("rank")
      val exactVal = byG(g)((rank - 1).toInt)
      assert(r.getAs[Long]("est_lb") <= exactVal &&
        exactVal <= r.getAs[Long]("est_ub"))
    }
  }

  test("negative values are rejected loudly") {
    val e = intercept[Exception] {
      QuantileSketch.cells(df(Seq(1L, -2L)), "v").collect()
    }
    assert(e.getMessage.contains("non-negative"),
      s"unexpected error: ${e.getMessage}")
  }

  test("nulls are skipped like the builtin aggregates") {
    import spark.implicits._
    val d = Seq(Some(5L), None, Some(7L)).toDF("v")
    val total = QuantileSketch.cells(d, "v").agg(sum("cnt")).head.getLong(0)
    assert(total == 2L)
  }
}
