package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties that make the
  * registered queries scale-safe (no accidental cartesian products in
  * the banded/bucketed paths, broadcasts where the design says
  * broadcast, partition pruning at the scan) asserted against the
  * physical plan, so a refactor that silently degrades the plan fails
  * here instead of in a 100 TB run.
  */
class PlanGuardSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("banded/bucketed similarity paths never degenerate to a cartesian product") {
    // e_ann_bruteforce / e_cos_neardup are EXCLUDED: all-pairs is their
    // documented contract (they are the verifiers for these paths)
    for (q <- Seq("e_ann_lsh", "e_cos_neardup_lsh", "d_minhash_lsh",
      "d_simhash_pairs", "d_ngram_jaccard", "d_contamination")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q plans a CartesianProduct — the band/bucket join key is gone")
    }
  }

  test("q5 dimension joins broadcast") {
    assert(plan("q5_local_supplier").contains("BroadcastHashJoin"))
  }

  test("contamination scan broadcasts the probe gram side") {
    assert(plan("d_contamination").contains("BroadcastHashJoin"))
  }

  test("partition-pruned sink scan carries partition filters") {
    val p = plan("s_partition_prune")
    assert(p.contains("PartitionFilters") && p.contains("o_orderstatus"),
      "scan does not prune on the partition column")
  }

  test("sampling queries stay map-side before aggregation (no joins at all)") {
    for (q <- Seq("p_train_test_split", "p_stratified_sample")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join; expected pure filter+agg")
    }
  }
}
