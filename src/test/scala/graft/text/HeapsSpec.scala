package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Heaps-growth census: exact prefix-distincts from the
  * first-bucket device, lowercase folding, empty buckets absent.
  */
class HeapsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("cumulative types equal prefix-distinct counts, tokens accumulate") {
    val docs = Seq(
      (0L, "a b a"), (1L, "b c"),   // bucket 0: toks 5, types a b c
      (2L, "c d"),                  // bucket 1: toks 2, new d
      (4L, "a e e")).toDF("doc_id", "text") // bucket 2: toks 3, new e
    val got = Vocab.heapsGrowth(docs, "doc_id", "text", bucketWidth = 2L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 5L, 3L, 5L, 3L),
      (1L, 2L, 1L, 7L, 4L),
      (2L, 3L, 1L, 10L, 5L)))
  }

  test("types fold case; a bucket with no new types still reports its tokens") {
    val docs = Seq((0L, "Foo foo"), (1L, "FOO")).toDF("doc_id", "text")
    val got = Vocab.heapsGrowth(docs, "doc_id", "text", bucketWidth = 1L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 1L, 1L), (1L, 0L, 1L)))
  }
}
