package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DimStatsSpec extends AnyFunSuite with SparkSpec {

  test("dead, stuck, and healthy dimensions are distinguishable") {
    import spark.implicits._
    // dim1 dead (all zero), dim2 stuck at 0.5, dim3 varies
    val d = Seq(
      (1L, Seq(0.0f, 0.5f, 0.25f)),
      (2L, Seq(0.0f, 0.5f, -0.75f)),
      (3L, Seq(0.0f, 0.5f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val out = DimStats.dimStats(d, "embedding").collect()
      .map(r => r.getAs[Int]("dim") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_zero"),
          r.getAs[Long]("min_q"), r.getAs[Long]("max_q"))).toMap
    assert(out(1) == (3L, 3L, 0L, 0L)) // dead
    assert(out(2)._3 == out(2)._4 && out(2)._2 == 0L) // stuck, nonzero
    // floor(-0.75 * 2^20) = -786432 exactly; no zeros in dim 3
    assert(out(3) == (3L, 0L, -786432L, 1048576L))
  }

  test("quantization floors toward negative infinity, exactly") {
    import spark.implicits._
    val d = Seq((1L, Seq(-0.1f))).toDF("vec_id", "embedding")
    val q = DimStats.dimStats(d, "embedding").head().getAs[Long]("min_q")
    // -0.1f widens to a double slightly above -0.1; floor of
    // (-0.1f double) * 2^20 = floor(-104857.59...) = -104858
    assert(q == math.floor(-0.1f.toDouble * 1048576L).toLong)
  }
}
