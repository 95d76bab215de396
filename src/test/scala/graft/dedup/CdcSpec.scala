package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CDC: chunks tile the document exactly, and — the property the op
  * exists for — an insertion at the head of a document leaves the
  * tail chunks IDENTICAL, where fixed-width shingle fingerprints
  * would all shift.
  */
class CdcSpec extends AnyFunSuite with SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  test("chunks tile the text: contiguous, full-cover, index-ordered") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("doc_id") < 40)
    val spans = Cdc.chunkSpans(docs, "doc_id", "text")
      .orderBy("id", "chunk_idx").collect()
      .groupBy(_.getLong(0))
    val lens = docs.select(col("doc_id"), length(col("text")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    spans.foreach { case (id, rows) =>
      var next = 1
      rows.sortBy(_.getInt(1)).foreach { r =>
        assert(r.getInt(2) == next, s"doc $id gap at chunk ${r.getInt(1)}")
        next += r.getInt(3)
      }
      assert(next == lens(id) + 1, s"doc $id chunks do not cover the text")
    }
  }

  test("head insertion leaves tail chunks identical (shift resistance)") {
    import spark.implicits._
    val body = spark.read.parquet(s"$sf001/documents.parquet")
      .orderBy(col("n_chars").desc).select("text").head().getString(0)
    val edited = "BREAKING EDIT INSERTED AT HEAD. " + body
    val df = Seq((1L, body), (2L, edited)).toDF("doc_id", "text")
    val spans = Cdc.chunkSpans(df, "doc_id", "text").collect()
    val h1 = spans.filter(_.getLong(0) == 1L).map(_.getString(4)).toSet
    val h2 = spans.filter(_.getLong(0) == 2L).map(_.getString(4)).toSet
    val shared = (h1 intersect h2).size.toDouble / h1.size
    assert(shared > 0.8,
      s"only ${(shared * 100).round}% of chunks survive a head insertion")
    // the contrast: fixed-width 64-char shingles at stride 64 share ~0
    val fw1 = body.grouped(64).toSet
    val fw2 = edited.grouped(64).toSet
    assert((fw1 intersect fw2).size < h1.size / 4)
  }

  test("short and boundary-free documents emit one whole-text chunk") {
    import spark.implicits._
    val df = Seq((1L, "tiny"), (2L, "x")).toDF("doc_id", "text")
    val out = Cdc.chunkSpans(df, "doc_id", "text").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getInt(1) == 1 && r.getInt(2) == 1)
    }
    assert(out.find(_.getLong(0) == 1L).get.getInt(3) == 4)
  }

  test("duplicateChunks finds planted cross-doc repetition") {
    import spark.implicits._
    val shared = "this exact paragraph appears in both documents " * 4
    val df = Seq(
      (1L, "unique prefix one. " + shared),
      (2L, "another head entirely, much longer. " + shared),
      (3L, "no overlap here at all, completely different words"))
      .toDF("doc_id", "text")
    val dup = Cdc.duplicateChunks(df, "doc_id", "text").collect()
    assert(dup.nonEmpty)
    assert(dup.forall(_.getLong(2) == 2L)) // docs 1 and 2, never 3
  }
}
