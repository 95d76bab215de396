package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** MMR: redundancy suppression on a planted near-duplicate cluster,
  * tie/order rules, and the bounded-candidate guard.
  */
class MmrSpec extends AnyFunSuite with SparkSpec {

  private def vec(primary: Int, eps: Double, at: Int = 1): Seq[Float] = {
    val v = Array.fill(64)(0.0)
    v(primary) = 1.0
    if (eps != 0) v(at) = eps
    v.map(_.toFloat).toSeq
  }

  test("a diverse moderate-rel candidate beats redundant near-top copies") {
    import spark.implicits._
    // query along dim 0; ids 10,11,12: near-identical high-rel
    // cluster; id 20: orthogonal-ish moderate-rel singleton
    val rows = Seq(
      (1L, vec(0, 0.0)), // query
      (10L, vec(0, 0.05)), (11L, vec(0, 0.051)), (12L, vec(0, 0.052)),
      (20L, {
        val v = Array.fill(64)(0.0); v(0) = 0.4; v(5) = 0.9
        v.map(_.toFloat).toSeq
      }))
    val df = rows.toDF("vec_id", "embedding")
    val cands = Ann.bruteForceTopK(
      df.filter($"vec_id" === 1), df, "vec_id", "embedding", k = 4)
    val out = Mmr.diversify(cands, df, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(out(0).getLong(1) == 10L) // pure relevance first (tie→min id)
    assert(out(1).getLong(1) == 20L,
      "MMR must promote the diverse candidate over redundant copies")
    assert(out(0).isNullAt(3) && !out(1).isNullAt(3))
    // relevance-only ordering would have picked 11 second
    assert(cands.orderBy(col("rank")).collect()(1).getLong(1) == 11L)
  }

  test("k larger than the candidate set returns all candidates") {
    import spark.implicits._
    val df = Seq((1L, vec(0, 0.0)), (2L, vec(0, 0.1)), (3L, vec(2, 0.3)))
      .toDF("vec_id", "embedding")
    val cands = Ann.bruteForceTopK(
      df.filter($"vec_id" === 1), df, "vec_id", "embedding", k = 5)
    val out = Mmr.diversify(cands, df, "vec_id", "embedding", k = 10)
    assert(out.count() == 2)
  }
}
