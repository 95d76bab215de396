package graft.text

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RepetitionSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  /** Independent sequential reference for the documented rules. */
  private def ref(
      text: String, topN: Int = 2, dupN: Int = 5,
  ): (Long, Long, Long, Long, Long) = {
    val lines = text.split("\n", -1).toSeq
    val nLines = lines.size.toLong
    val lineCounts = lines.groupBy(identity).view.mapValues(_.size).toMap
    val dupLines = lineCounts.values.map(_ - 1L).sum
    val lineChars = lines.map(_.length.toLong).sum
    val dupLineChars =
      lineCounts.map { case (l, c) => l.length.toLong * (c - 1) }.sum
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val tokChars = toks.mkString(" ").length.toLong
    def grams(n: Int): Seq[String] =
      toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    val topCensus = grams(topN).groupBy(identity).view.mapValues(_.size).toMap
    val topChars =
      if (topCensus.isEmpty) 0L
      else {
        val (g, c) = topCensus.toSeq.minBy { case (g, c) => (-c, g) }
        c.toLong * g.length
      }
    val dupGramChars = grams(dupN).groupBy(identity)
      .collect { case (g, occ) if occ.size > 1 => occ.size.toLong * g.length }
      .sum
    def ppm(n: Long, d: Long): Long = if (d > 0) n * 1000000L / d else 0L
    (nLines, ppm(dupLines, nLines), ppm(dupLineChars, lineChars),
      ppm(topChars, tokChars), ppm(dupGramChars, tokChars))
  }

  private def run(
      df: DataFrame, topN: Int = 2, dupN: Int = 5,
  ): Map[Long, (Long, Long, Long, Long, Long)] =
    Repetition.gopherRepetition(df, "doc_id", "text", topN, dupN)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap

  test("hand-computed census on a worked example") {
    val out = run(docs(
      1L -> "Hello world\nHello world\nbye",
      2L -> "a b c d e a b c d e a b c d e",
      3L -> "",
      4L -> "one line only"))
    // doc 1: 3 lines, 1 repeat (ppm 333333); 11 of 25 line chars
    // repeated (440000); top 2-gram "hello world" covers 22 of 27
    // normalized chars (814814); no duplicated 5-gram
    assert(out(1L) === ((3L, 333333L, 440000L, 814814L, 0L)))
    // doc 2: "a b c d e" period 5 over 15 tokens: every 5-gram with a
    // 5-apart twin duplicates; verify against the reference rule
    assert(out(2L) === ref("a b c d e a b c d e a b c d e"))
    assert(out(2L)._5 > 0L, s"periodic doc has no duplicated 5-grams")
    // empty doc: one empty line, zero denominators report 0
    assert(out(3L) === ((1L, 0L, 0L, 0L, 0L)))
    assert(out(4L)._1 === 1L)
  }

  test("matches the sequential reference on random multi-line docs; partition-independent") {
    val rnd = new Random(7)
    val words = Vector("aa", "b", "ccc", "dd", "e", "ff", "g")
    def sentence(): String =
      Seq.fill(1 + rnd.nextInt(9))(words(rnd.nextInt(words.size)))
        .mkString(" ")
    def doc(): String = {
      val base = Seq.fill(1 + rnd.nextInt(5))(sentence())
      // duplicate some lines to exercise the dup census
      val lines = base ++ Seq.fill(rnd.nextInt(3))(base(rnd.nextInt(base.size)))
      lines.mkString("\n")
    }
    val rows = (1L to 40L).map(i => i -> doc())
    val want = rows.map { case (id, t) => id -> ref(t) }.toMap
    assert(run(docs(rows: _*)) === want)
    assert(run(docs(rows: _*).repartition(7)) === want)
    // other (topN, dupN) dials agree with the reference too
    val want32 = rows.map { case (id, t) => id -> ref(t, 3, 2) }.toMap
    assert(run(docs(rows: _*), topN = 3, dupN = 2) === want32)
  }

  test("top-gram count ties break on the lexicographically smallest gram") {
    // "b a" and "a b" both occur once; the smallest ("a b", 3 chars)
    // must win in both engines
    val out = run(docs(1L -> "b a b"))
    val (_, _, _, topPpm, _) = out(1L)
    assert(topPpm === 1000000L * 3L / 5L, s"tie not broken smallest: $out")
  }
}
