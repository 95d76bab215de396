package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** RRF fusion axioms: exact nano contributions, both-systems
  * summation, tie-break, and absent-document semantics.
  */
class FusionSpec extends AnyFunSuite with SparkSpec {

  test("rrfContrib matches exact integer arithmetic for small ranks") {
    import spark.implicits._
    val df = (1 to 1000).toDF("rnk")
      .select(col("rnk"), Fusion.rrfContrib(col("rnk"), 60).as("c"))
    val bad = df.filter(col("c") =!= expr("1000000000 div (60 + rnk)")).count()
    assert(bad == 0L)
  }

  test("document ranked by both systems outranks single-system documents") {
    import spark.implicits._
    // doc 5 is rank 3 in BOTH systems: 2*floor(1e9/63) > floor(1e9/61)
    val sys1 = Seq((1, 9L, 1), (1, 5L, 3)).toDF("query_id", "doc_id", "rnk")
    val sys2 = Seq((1, 7L, 1), (1, 5L, 3)).toDF("query_id", "doc_id", "rnk")
    val out = Fusion.rrfFuse(Seq(sys1, sys2), k = 10).orderBy("rnk").collect()
    assert(out.head.getLong(1) == 5L && out.head.getInt(2) == 2)
    assert(out.head.getLong(3) == 2L * (1000000000L / 63))
    // singles tie at floor(1e9/61); doc_id asc breaks it
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 7L, 9L))
  }

  test("k truncates the fused list per query") {
    import spark.implicits._
    val sys1 = (1 to 8).map(r => (1, r.toLong, r)).toDF("query_id", "doc_id", "rnk")
    val out = Fusion.rrfFuse(Seq(sys1), k = 3).collect()
    assert(out.length == 3)
    assert(out.map(_.getInt(4)).sorted.toSeq == Seq(1, 2, 3))
  }
}
