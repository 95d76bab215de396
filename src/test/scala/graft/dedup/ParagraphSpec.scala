package graft.dedup

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ParagraphSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))
  }

  private def run(rows: (Long, String)*): Map[Long, String] =
    Paragraph.dedupFirstOccurrence(docs(rows: _*), "doc_id", "text", sep = "|")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("first occurrence survives, later cross-document occurrences vanish") {
    val out = run(
      1L -> "alpha|shared|beta",
      2L -> "shared|gamma",
      3L -> "delta|shared|alpha")
    assert(out(1L) == "alpha|shared|beta")
    assert(out(2L) == "gamma")
    assert(out(3L) == "delta")
  }

  test("within-document repeats keep only the first position") {
    val out = run(1L -> "x|y|x|x|z")
    assert(out(1L) == "x|y|z")
  }

  test("a fully-deduplicated document survives as the empty string") {
    val out = run(1L -> "a|b", 2L -> "a|b", 3L -> "b|a")
    assert(out(1L) == "a|b")
    assert(out(2L) == "")
    assert(out(3L) == "")
    assert(out.size == 3, "every input row must come back")
  }

  test("empty paragraphs dedup like any other") {
    val out = run(1L -> "a||b", 2L -> "|c")
    // doc 1 owns the first empty span; doc 2's leading empty vanishes
    assert(out(1L) == "a||b")
    assert(out(2L) == "c")
  }

  test("result is independent of partitioning (first = lowest (id, idx))") {
    val rows = (0L until 40L).map(i => i -> s"common|unique-$i|${if (i % 2 == 0) "even" else "odd"}")
    val a = Paragraph.dedupFirstOccurrence(docs(rows: _*), "doc_id", "text", "|")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Paragraph.dedupFirstOccurrence(
      docs(rows: _*).repartition(13), "doc_id", "text", "|")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    assert(a.contains(0L -> "common|unique-0|even"))
    assert(a.contains(1L -> "unique-1|odd"))
    assert(a.contains(2L -> "unique-2"))
  }

  test("reserved working columns are rejected") {
    val bad = docs(1L -> "a").withColumnRenamed("text", "__para")
    intercept[IllegalArgumentException] {
      Paragraph.dedupFirstOccurrence(bad, "doc_id", "__para")
    }
  }

  test("digest-keyed join is 1:1 under a ubiquitous paragraph — linear at n vs 2n") {
    // the classic skew case: ONE paragraph planted in EVERY document.
    // The canonical side is one row per DISTINCT paragraph, so the join
    // must stay exactly 1:1 with the exploded input (2 paragraphs/doc →
    // exactly 2n join rows); a frequency-keyed design would amplify the
    // hot key to n² here. Measured at n and 2n to pin the growth rate,
    // the way AnnSpec pins LSH candidate volume.
    def joinRows(n: Int): Long = {
      val rows = (0L until n.toLong).map(i => i -> s"EVERYWHERE|unique-$i")
      Paragraph.joinedParagraphs(docs(rows: _*), "doc_id", "text", "|").count()
    }
    assert(joinRows(500) == 2L * 500,
      "join amplified: canonical side no longer one row per distinct paragraph")
    assert(joinRows(1000) == 2L * 1000,
      "join volume not linear in corpus size under a ubiquitous paragraph")
    // and the dedup result under the same skew stays correct: doc 0
    // keeps the hot paragraph, every other doc sheds it
    val out = run((0L until 50L).map(i => i -> s"EVERYWHERE|unique-$i"): _*)
    assert(out(0L) == "EVERYWHERE|unique-0")
    (1L until 50L).foreach(i => assert(out(i) == s"unique-$i"))
  }

  test("oracle position encoding is guarded: width contract enforced, not silent") {
    intercept[IllegalArgumentException] {
      Paragraph.dedupFirstOccurrenceSql("SELECT 1", "|", positionWidth = 0L)
    }
    // the generated SQL must carry the runtime error() guards for the
    // three silent-divergence conditions (idx >= width, negative id,
    // BIGINT overflow) — DuckDB executes them; this pins their presence
    val sql = Paragraph.dedupFirstOccurrenceSql(
      "SELECT doc_id, text FROM documents", "|", positionWidth = 7L)
    assert(sql.contains("max(idx) >= 7"))
    assert(sql.contains("min(doc_id) < 0"))
    assert(sql.contains("(9223372036854775807 - 7) / 7"))
    assert(sql.contains("error("))
  }
}
