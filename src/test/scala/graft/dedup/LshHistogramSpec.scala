package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The capacity-planning histogram prices the pair join correctly:
  * size classes account for every (band, doc) placement, and
  * cand_pairs equals the candidate volume the real LSH join emits
  * before its cross-band dedup.
  */
class LshHistogramSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("histogram accounts for every bucket and predicts candidate volume") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact dup of 1
      (3L, "omega psi chi phi"),
      (4L, "unrelated words entirely here")).toDF("doc_id", "text")
    val hist = Dedup.lshBucketHistogram(docs, "doc_id", "text",
      numHashes = 16, bands = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // every band places all 4 docs: sum over sizes of sz*n_buckets = 4
    (0 until 4).foreach { b =>
      val placed = hist.collect { case ((`b`, sz), (n, _)) => sz * n }.sum
      assert(placed == 4L, s"band $b places $placed of 4")
    }
    // docs 1 and 2 are identical -> size-2 buckets in all 4 bands,
    // each predicting exactly 1 candidate pair
    // (toSeq first: collect-to-pairs on a Map would rebuild a Map
    // and swallow the four identical (1, 1) entries)
    val size2 = hist.toSeq.collect { case ((_, 2L), (n, cp)) => (n, cp) }
    assert(size2.map(_._1).sum == 4L)
    assert(size2.map(_._2).sum == 4L)
    // the real join dedups those 4 band collisions to 1 pair
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      numHashes = 16, bands = 4).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
  }

  test("recall audit: exact duplicates are perfect recall; disjoint docs contribute no truth") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "omega psi chi phi")).toDF("doc_id", "text")
    val r = Dedup.lshRecallAudit(docs, "doc_id", "text",
      numHashes = 16, bands = 4, threshold = 0.5).head()
    // truth = the one identical pair; identical signatures always
    // share every band, and 16/16 agreement passes any threshold
    assert((r.getLong(0), r.getLong(2), r.getLong(3)) == (1L, 1L, 1000000L))
  }

  test("recall audit: zero truth reports zero recall, not a division error") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "omega psi chi")).toDF("doc_id", "text")
    val r = Dedup.lshRecallAudit(docs, "doc_id", "text",
      numHashes = 16, bands = 4, threshold = 0.5).head()
    assert((r.getLong(0), r.getLong(2), r.getLong(3)) == (0L, 0L, 0L))
  }
}
