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

  test("banded/bucketed similarity paths never degenerate to an all-pairs join") {
    // e_ann_bruteforce / e_cos_neardup are EXCLUDED: all-pairs is their
    // documented contract (they are the verifiers for these paths).
    // e_ann_ivf is excluded too: its crossJoin against the single-row
    // broadcast centroid array is a BroadcastNestedLoopJoin by design.
    // At test scale a dropped equi-key plans BroadcastNestedLoopJoin
    // (small side broadcastable), NOT CartesianProduct — guard both.
    for (q <- Seq("e_ann_lsh", "e_cos_neardup_lsh", "d_minhash_lsh",
      "d_simhash_pairs", "d_ngram_jaccard", "d_contamination")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q plans an all-pairs join — the band/bucket equi-key is gone")
    }
  }

  test("q5 dimension joins broadcast") {
    assert(plan("q5_local_supplier").contains("BroadcastHashJoin"))
  }

  test("contamination scan broadcasts the probe gram side") {
    assert(plan("d_contamination").contains("BroadcastHashJoin"))
  }

  test("partition-pruned sink scan carries partition filters") {
    // the column must appear INSIDE the PartitionFilters bracket: every
    // parquet scan prints an (often empty) PartitionFilters key, and an
    // unpartitioned write would still mention the column in PushedFilters
    val p = plan("s_partition_prune")
    val pruned = "PartitionFilters: \\[[^\\]]*o_orderstatus".r
      .findFirstIn(p).isDefined
    assert(pruned, "partition column is not in PartitionFilters — the " +
      "write lost its partitionBy or the filter no longer prunes")
  }

  test("driver smoke gate: entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query has an oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries-only: ${q.diff(o)}; oracle-only: ${o.diff(q)}")
  }

  test("sampling queries stay map-side before aggregation (no joins at all)") {
    for (q <- Seq("p_train_test_split", "p_stratified_sample")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join; expected pure filter+agg")
    }
  }
}
