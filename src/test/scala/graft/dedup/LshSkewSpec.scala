package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Proof for SCALE.md's skew claim on the banded LSH joins: a
  * pathological bucket (corpus boilerplate hashing every document
  * into one band key) is handled by EITHER guard layer —
  *   1. the census (default): the hot bucket is dropped before the
  *      self-join, so no reducer ever owns it;
  *   2. AQE skew-join (census bypassed): the sort-merge self-join's
  *      oversized partition is split at runtime into advisory-sized
  *      chunks (`AQEShuffleRead skewed` in the final plan).
  * Both layers are exercised against the SAME planted corpus.
  */
class LshSkewSpec extends AnyFunSuite with SparkSpec {

  /** 400 copies of one boilerplate text (every band key identical →
    * one dominant bucket) + 100 distinct fillers.
    */
  private def planted = spark.range(500).toDF("doc_id")
    .select(col("doc_id"),
      when(col("doc_id") < 400,
        lit("the same hot boilerplate text repeated across the corpus"))
        .otherwise(concat(lit("unique filler document number "),
          col("doc_id").cast("string"),
          lit(" with its own words"))).as("text"))

  test("census path: the dominant bucket is dropped before the self-join") {
    val pairs = Dedup.minhashLshPairs(planted, "doc_id", "text",
      numHashes = 16, bands = 4, maxBucketSize = 100)
    // 400 identical docs would otherwise emit 400·399/2 = 79,800 pairs;
    // with the census they contribute ZERO (every band bucket they
    // share exceeds the cap). The 100 fillers share their template
    // shingles and legitimately pair among themselves — bounded by
    // C(100,2) = 4,950 — so the census claim is the hot-doc zero, and
    // the total staying under the filler ceiling proves no hot pair
    // leaked into it.
    val n = pairs.count()
    assert(n <= 4950, s"census failed to drop the hot bucket: $n pairs")
    assert(pairs.filter(col("id_a") < 400 && col("id_b") < 400).count() == 0,
      "hot-bucket docs still paired — the census anti-join is broken")
  }

  test("AQE splits the skewed band-join partition when the census is bypassed") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: the hot bucket's partition is tens of
      // KB, not the production 256 MB default
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // the self-join must be sort-merge for OptimizeSkewedJoin to apply
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pairs = Dedup.minhashLshPairs(planted, "doc_id", "text",
        numHashes = 16, bands = 4, maxBucketSize = Int.MaxValue,
        persistSignatures = false)
      val qe = pairs.queryExecution
      // execute THIS queryExecution (count()/collect() on a derived
      // Dataset would finalize a different adaptive plan)
      qe.toRdd.count()
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skewed"),
        s"AQE did not split the skewed band-join partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
