package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Metric semantics: hand-checked MRR/recall, nDCG against the
  * literal weight table, capped recall, and the no-relevant case.
  */
class RankEvalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("weight table: monotone decreasing, w(1) = 1e6") {
    val w = RankEval.dcgWeightsPpm(10)
    assert(w.head == 1000000L)
    assert(w == w.sorted.reverse)
    assert(RankEval.idcgPrefixPpm(3) == Seq(w(0), w(0) + w(1), w(0) + w(1) + w(2)))
  }

  private def labels = Seq(
    (1L, 0), (10L, 0), (11L, 1), (12L, 0),
    (2L, 2)) // label 2 has a single member: query 2 has n_rel = 0
    .toDF("id", "label")

  test("hand-computed MRR, capped recall, and nDCG") {
    // query 1 (label 0): run hits label-0 docs at ranks 1 and 3
    val runs = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val got = RankEval.metrics(runs, labels, "id", "label", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val w = RankEval.dcgWeightsPpm(3)
    val idcg2 = RankEval.idcgPrefixPpm(3)(1)
    assert(got.toSeq == Seq(
      (1L, 2L, 1000000L, 1000000L, (w(0) + w(2)) * 1000000L / idcg2)))
  }

  test("no other member of the query's label: all metrics 0") {
    val runs = Seq((2L, 10L, 1), (2L, 11L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val got = RankEval.metrics(runs, labels, "id", "label", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 0L, 0L, 0L)))
  }

  test("recall caps at k when the label is bigger than the window") {
    // label 0 has 5 other members but k=2: perfect run -> recall 1e6
    val bigLabels = (Seq((1L, 0)) ++ (10L to 15L).map(i => (i, 0)))
      .toDF("id", "label")
    val runs = Seq((1L, 10L, 1), (1L, 11L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val got = RankEval.metrics(runs, bigLabels, "id", "label", k = 2)
      .collect().head
    assert(got.getLong(1) == 6L)        // n_rel
    assert(got.getLong(3) == 1000000L)  // recall capped at k
    assert(got.getLong(4) == 1000000L)  // ideal prefix filled -> nDCG 1
  }
}
