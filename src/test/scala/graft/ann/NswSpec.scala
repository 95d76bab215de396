package graft.ann

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Graph-ANN semantics: the beam walks the graph toward the query's
  * region, saturating beam+rounds recovers the exact top-k, and the
  * build guard bounds the all-pairs arm.
  */
class NswSpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: Seq[(Long, Seq[Float])], cols: (String, String)) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v) }, 2),
      StructType(Seq(StructField(cols._1, LongType),
        StructField(cols._2, ArrayType(FloatType)))))

  // 12 unit-ish vectors on a circle: angular neighbors are cosine
  // neighbors, so the kNN graph is a ring — beam search must WALK it
  private def circle = (0L until 12L).map { i =>
    val a = i * math.Pi / 6
    (i, Seq(math.cos(a).toFloat, math.sin(a).toFloat))
  }

  test("beam search walks the ring from entry 0 to the far side") {
    val c = frame(circle, ("id", "v"))
    val g = Nsw.knnGraph(c, "id", "v", k = 2) // ring edges
    // query at angle 7π/6 -> true NN is node 7, antipodal to entry 0
    val q = frame(Seq((100L,
      Seq(math.cos(7 * math.Pi / 6).toFloat,
        math.sin(7 * math.Pi / 6).toFloat))), ("id", "v"))
    val got = Nsw.beamSearch(g, c, q, "id", "v",
      beam = 3, rounds = 6, k = 1).collect()
    assert(got.length == 1 && got.head.getLong(1) == 7L,
      s"beam failed to reach node 7: ${got.toSeq}")
  }

  test("too few rounds strands the beam near the entry") {
    val c = frame(circle, ("id", "v"))
    val g = Nsw.knnGraph(c, "id", "v", k = 2)
    val q = frame(Seq((100L,
      Seq(math.cos(7 * math.Pi / 6).toFloat,
        math.sin(7 * math.Pi / 6).toFloat))), ("id", "v"))
    val got = Nsw.beamSearch(g, c, q, "id", "v",
      beam = 2, rounds = 1, k = 1).collect()
    assert(got.head.getLong(1) != 7L) // one hop can't cross the ring
  }

  test("saturated beam + rounds equals the exact top-k") {
    val c = frame(circle, ("id", "v"))
    val g = Nsw.knnGraph(c, "id", "v", k = 3)
    val q = frame(Seq(
      (100L, Seq(0.9f, 0.43f)), (101L, Seq(-0.7f, -0.7f))), ("id", "v"))
    val beam = Nsw.beamSearch(g, c, q, "id", "v",
      beam = 12, rounds = 12, k = 4)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Ann.bruteForceTopK(q, c, "id", "v", k = 4)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(beam == exact)
  }

  test("results are partition-independent") {
    val c = frame(circle, ("id", "v"))
    val g = Nsw.knnGraph(c, "id", "v", k = 2)
    val q = frame(Seq((100L, Seq(0.2f, -0.97f))), ("id", "v"))
    def run(parts: Int) =
      Nsw.beamSearch(g.repartition(parts), c.repartition(parts), q,
        "id", "v", beam = 4, rounds = 4, k = 3)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(run(2) == run(7))
  }

  test("nn-descent: rounds improve edge recall; one group is exact") {
    val c = frame(circle, ("id", "v"))
    def recall(rounds: Int, groups: Int, seeds: Int): Long =
      Nsw.graphRecall(
        Nsw.nnDescentGraph(c, "id", "v", k = 2, rounds, groups, seeds),
        c, "id", "v", k = 2).collect().head.getLong(3)
    // one bucket = all-pairs init = already the exact graph
    assert(recall(0, 1, 1) == 1000000L)
    // 4 buckets x 3 seedings: init misses half the ring edges; two
    // local-join rounds recover the FULL exact graph on this instance
    val r0 = recall(0, 4, 3)
    val r2 = recall(2, 4, 3)
    assert(r0 < 1000000L, s"init unexpectedly exact: $r0")
    assert(r2 == 1000000L, s"descent did not converge: $r0 -> $r2")
  }

  test("nn-descent with ONE seeding is trapped in its init components") {
    // the documented pathology that motivates multi-seed init:
    // disjoint md5 groups are disjoint graph components, and the
    // local join can never merge components — recall stays at zero
    val c = frame(circle, ("id", "v"))
    def recall(rounds: Int): Long =
      Nsw.graphRecall(
        Nsw.nnDescentGraph(c, "id", "v", k = 2, rounds, groups = 6,
          initSeeds = 1),
        c, "id", "v", k = 2).collect().head.getLong(3)
    assert(recall(0) == 0L && recall(3) == 0L)
  }

  test("the graph-build guard raises above maxRows") {
    val c = frame(circle, ("id", "v"))
    val ex = intercept[Exception] {
      Nsw.knnGraph(c, "id", "v", k = 2, maxRows = 5).collect()
    }
    assert(ex.getMessage != null)
  }
}
