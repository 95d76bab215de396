package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class NgramsSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  test("noveltyRate counts bigram occurrences unseen in the reference") {
    val ref = docs(100L -> "the cat sat on the mat")
    // "the cat"/"cat sat" seen; "sat up" novel; occurrences counted
    val out = Ngrams.noveltyRate(
      docs(1L -> "THE CAT sat up the cat sat", // grams: the-cat, cat-sat, sat-up, up-the, the-cat, cat-sat
        2L 	-> "the cat",                      // 1 gram, seen
        3L -> "zebra",                         // < n tokens -> 0 grams
        4L -> ""),                             // empty -> 0 grams
      "doc_id", "text", ref, "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(out(1L) === ((6, 2, 2.0 / 6))) // sat-up, up-the novel
    assert(out(2L) === ((1, 0, 0.0)))
    assert(out(3L) === ((0, 0, 0.0)))
    assert(out(4L) === ((0, 0, 0.0)))
  }

  test("an empty reference rates every gram novel; partitioning-independent") {
    val empty = docs().limit(0)
    val corpus = docs(1L -> "a b c", 2L -> "x y")
    val out = Ngrams.noveltyRate(corpus, "doc_id", "text", empty, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out === Map(1L -> 1.0, 2L -> 1.0))
    val a = Ngrams.noveltyRate(corpus, "doc_id", "text",
        docs(9L -> "a b"), "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val b = Ngrams.noveltyRate(corpus.repartition(7), "doc_id", "text",
        docs(9L -> "a b").repartition(5), "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(a === b)
  }

  test("reserved columns and bad n are rejected") {
    intercept[IllegalArgumentException] {
      Ngrams.noveltyRate(docs(1L -> "a"), "doc_id", "text",
        docs(2L -> "b"), "text", n = 0)
    }
    intercept[IllegalArgumentException] {
      Ngrams.noveltyRate(
        docs(1L -> "a").withColumnRenamed("text", "__gram"),
        "doc_id", "__gram", docs(2L -> "b"), "text")
    }
  }
}
