package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.HilbertIndex.{d2xy, hilbert_index, hilbertSqlCtes}

class HilbertIndexSpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: (Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) => Row(a, b) }, 2),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))

  private def hs(df: org.apache.spark.sql.DataFrame, bits: Int) =
    df.select(hilbert_index(col("a"), col("b"), bits))
      .collect().map(_.getLong(0))

  test("base case: the 2x2 U-shape") {
    // the order-1 Hilbert curve visits (0,0) (0,1) (1,1) (1,0)
    assert(hs(frame((0L, 0L)), 1).head === 0L)
    assert(hs(frame((0L, 1L)), 1).head === 1L)
    assert(hs(frame((1L, 1L)), 1).head === 2L)
    assert(hs(frame((1L, 0L)), 1).head === 3L)
  }

  test("bijection on the full grid, and xy2d inverts d2xy (bits=5)") {
    val bits = 5
    val n = 1L << bits
    val cells = (0L until n * n).map(d2xy(bits, _))
    assert(cells.distinct.length === (n * n).toInt) // d2xy injective
    val ds = hs(frame(cells: _*), bits)
    assert(ds.toSeq === (0L until n * n)) // xy2d(d2xy(d)) = d, in order
  }

  test("unit-step adjacency: consecutive indexes are grid neighbors") {
    val bits = 5
    val n = 1L << bits
    val pts = (0L until n * n).map(d2xy(bits, _))
    pts.sliding(2).foreach { case Seq((x0, y0), (x1, y1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L,
        s"jump between ($x0,$y0) and ($x1,$y1)")
    }
  }

  test("inputs are masked to the low bits") {
    assert(hs(frame((1024L + 3L, 2L)), 5).toSeq ===
      hs(frame((3L, 2L)), 5).toSeq)
  }

  test("the SQL CTE chain reproduces the native expression exactly") {
    val bits = 7
    // pseudo-random but deterministic sample of the 128x128 grid
    val rows = (0 until 400).map { i =>
      ((i * 2654435761L >>> 7) & 127L, (i * 40503L >>> 3) & 127L)
    }
    frame(rows: _*).createOrReplaceTempView("hilb_in")
    val ctes = hilbertSqlCtes("hilb_in", "a", "b", bits,
      passCols = Seq("a", "b"), finalCte = "hfin", outCol = "h")
    // the rendering is DuckDB-portable arithmetic; Spark SQL runs the
    // identical text, so cross-engine agreement reduces to this pin
    val sql = spark.sql(s"WITH $ctes SELECT a, b, h FROM hfin")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val native = frame(rows: _*)
      .select(col("a"), col("b"), hilbert_index(col("a"), col("b"), bits).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sql === native)
  }

  test("hilbert zones are never looser than z-order on axis ranges (bits=5)") {
    // for every contiguous index range of length 64 on the 32x32
    // grid, the bounding box the zone must cover: Hilbert's unit-step
    // walk keeps it small; assert the worst-case envelope area is
    // <= the Morton layout's (the data-skipping claim, measured)
    val bits = 5
    val n = 1L << bits
    def worstArea(index: Seq[(Long, (Long, Long))]): Long =
      index.sortBy(_._1).map(_._2).grouped(64).map { cells =>
        val xs = cells.map(_._1); val ys = cells.map(_._2)
        (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
      }.max
    val all = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val hIdx = hs(frame(all: _*), bits).zip(all).map { case (d, p) => (d, p) }
    val zIdx = frame(all: _*)
      .select(ZInterleave.z_interleave(col("a"), col("b"), bits))
      .collect().map(_.getLong(0)).zip(all).map { case (d, p) => (d, p) }
    assert(worstArea(hIdx.toSeq) <= worstArea(zIdx.toSeq))
  }
}
