package graft.text

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class C4Spec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  private def run(df: DataFrame): Map[Long, (Long, Long, Long, Boolean, Boolean, Boolean)] =
    C4.c4Clean(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))))
      .toMap

  /** Independent sequential reference for the documented rules. */
  private def ref(text: String): (Long, Long, Long, Boolean, Boolean, Boolean) = {
    val lines = text.split("\n", -1).toSeq
    def words(l: String): Int =
      l.trim.split("\\s+").count(_.nonEmpty)
    val kept = lines.filter(l =>
      l.replaceAll(" +$", "").matches("(?s).*[.!?\"]\r?") && words(l) >= 5)
    val cleaned = kept.mkString("\n")
    val sentences = "[.!?]+".r.findAllIn(cleaned).size.toLong
    val lorem = text.toLowerCase.contains("lorem ipsum")
    val brace = text.contains("{")
    (lines.size.toLong, kept.size.toLong, sentences,
      lorem, brace, sentences >= 3 && !lorem && !brace)
  }

  test("line rule: terminal punctuation AND at least five words") {
    val out = run(docs(
      1L -> "one two three four five.",   // kept
      2L -> "one two three four.",        // 4 words: dropped
      3L -> "one two three four five",    // no punct: dropped
      4L -> "he said one two \"three\"",  // ends in quote: kept
      5L -> "one two three four five.   ", // trailing spaces rtrim: kept
      6L -> "one two three four five.\r"    // CRLF residue: kept on BOTH engines
    ))
    assert(out(1L)._2 === 1L)
    assert(out(2L)._2 === 0L)
    assert(out(3L)._2 === 0L)
    assert(out(4L)._2 === 1L)
    assert(out(5L)._2 === 1L)
    assert(out(6L)._2 === 1L)
  }

  test("page rules: sentence floor, brace, lorem ipsum (case-insensitive)") {
    val three = "a b c d e.\nf g h i j!\nk l m n o?"
    val two = "a b c d e.\nf g h i j!"
    val out = run(docs(
      1L -> three,                          // 3 sentences: keep
      2L -> two,                            // 2 sentences: drop
      3L -> (three + "\nx { y"),            // brace: drop
      4L -> (three + "\nLoReM IpSuM here"), // lorem: drop
      5L -> ""))                            // empty: drop
    assert(out(1L) === ((3L, 3L, 3L, false, false, true)))
    assert(out(2L)._6 === false && out(2L)._3 === 2L)
    assert(out(3L)._5 === true && out(3L)._6 === false)
    assert(out(4L)._4 === true && out(4L)._6 === false)
    assert(out(5L) === ((1L, 0L, 0L, false, false, false)))
  }

  test("matches the sequential reference on random multi-line docs") {
    val rnd = new Random(13)
    val words = Vector("alpha", "beta", "gamma", "naïve", "x", "{", "lorem", "ipsum")
    val tails = Vector(".", "!", "?", "\"", "", " ", "...", ".\r", "\r")
    def line(): String =
      Seq.fill(rnd.nextInt(9))(words(rnd.nextInt(words.size)))
        .mkString(" ") + tails(rnd.nextInt(tails.size))
    val rows = (1L to 50L).map(i =>
      i -> Seq.fill(1 + rnd.nextInt(6))(line()).mkString("\n"))
    val want = rows.map { case (id, t) => id -> ref(t) }.toMap
    assert(run(docs(rows: _*)) === want)
    assert(run(docs(rows: _*).repartition(7)) === want)
  }
}
