package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The Selinger estimate: exact on uniform keys, its decomposed
  * integer form equal to the naive product formula, and the exact
  * arm counting real multiplicities.
  */
class JoinStatsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("uniform fan-out: estimate equals the exact join size") {
    // A: keys 1..4 twice each; B: keys 1..4 once -> est = 8*4/4 = 8
    val a = (1 to 4).flatMap(k => Seq(k, k)).toDF("k")
    val b = (1 to 4).toDF("k")
    val r = JoinStats.joinSizeEstimate(a, b, "k", "k").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (8L, 4L, 4L, 4L))
    assert(r.getLong(4) == 8L && r.getLong(5) == 8L)
  }

  test("skewed keys: estimate undershoots, exact arm reports truth") {
    // A: key 1 x9 + key 2; B: key 1 x5 -> exact 45, est = 10*5/2 = 25
    val a = (Seq.fill(9)(1) :+ 2).toDF("k")
    val b = Seq.fill(5)(1).toDF("k")
    val r = JoinStats.joinSizeEstimate(a, b, "k", "k").head()
    assert(r.getLong(4) == 25L)
    assert(r.getLong(5) == 45L)
  }

  test("decomposed division equals (n_a*n_b) div m on awkward remainders") {
    // n_a=7, m=ndv_a=7 vs ndv_b=3 -> m=7; n_b=3: (7*3) div 7 = 3
    val a = (1 to 7).toDF("k")
    val b = Seq(1, 2, 9).toDF("k")
    val r = JoinStats.joinSizeEstimate(a, b, "k", "k").head()
    assert(r.getLong(4) == (7L * 3L) / 7L)
    assert(r.getLong(5) == 2L)
  }
}
