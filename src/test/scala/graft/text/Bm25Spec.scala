package graft.text

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class Bm25Spec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  /** Independent sequential BM25 with the library's odds-ratio idf
    * and micro-quantization.
    */
  private def expected(
      corpus: Seq[(Long, String)], queries: Seq[(Int, String)],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
  ): Map[(Int, Long), (Int, Long, Int)] = {
    def toks(s: String): Seq[String] =
      s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val docToks = corpus.map { case (id, t) => id -> toks(t) }
    val n = corpus.size.toLong
    val total = docToks.map(_._2.size.toLong).sum
    val avgdl = total.toDouble / n.toDouble
    def df(term: String): Long = docToks.count(_._2.contains(term)).toLong
    queries.flatMap { case (qid, qtext) =>
      val terms = toks(qtext).distinct
      val perDoc = docToks.flatMap { case (id, t) =>
        val matched = terms.filter(t.contains)
        if (matched.isEmpty) None
        else {
          val micros = matched.map { term =>
            val tfv = t.count(_ == term).toLong
            val dfv = df(term)
            val idf = ((n - dfv).toDouble + 0.5) / (dfv.toDouble + 0.5)
            val norm = k1 * ((1 - b) + b * (t.size.toDouble / avgdl))
            val tfpart = (tfv.toDouble * (k1 + 1)) / (tfv.toDouble + norm)
            math.floor(idf * tfpart * 1e6).toLong
          }
          Some((id, matched.size, micros.sum))
        }
      }
      perDoc.sortBy { case (id, _, s) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, nt, s), i) => (qid, id) -> ((nt, s, i + 1))
      }
    }.toMap
  }

  private def run(
      corpus: DataFrame, queries: Seq[(Int, String)], k: Int,
  ): Map[(Int, Long), (Int, Long, Int)] =
    Bm25.topK(corpus, "doc_id", "text", queries, k)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getInt(2), r.getLong(3), r.getInt(4))))
      .toMap

  test("matches the sequential reference on a worked corpus") {
    val corpus = Seq(
      1L -> "hash join fast hash",
      2L -> "window agg stream window window",
      3L -> "hash scan table scan data",
      4L -> "join join join filter",
      5L -> "sort merge batch")
    val queries = Seq(1 -> "hash join", 2 -> "window", 3 -> "missingterm")
    val want = expected(corpus, queries, k = 3)
    val got = run(docs(corpus: _*), queries, k = 3)
    assert(got === want)
    // query 3 matches nothing
    assert(!got.keys.exists(_._1 === 3))
  }

  test("rare terms outrank ubiquitous ones at equal tf") {
    // "rare" in 1 doc, "common" in all 4; doc lengths equal
    val corpus = Seq(
      1L -> "rare common pad pad",
      2L -> "common filler filler pad",
      3L -> "common filler filler pad",
      4L -> "common filler filler pad")
    val got = run(docs(corpus: _*), Seq(1 -> "rare common"), k = 4)
    val top = got.collect { case ((1, id), (_, _, 1)) => id }.toSet
    assert(top === Set(1L))
    assert(got((1, 1L))._1 === 2) // doc 1 matched both terms
  }

  test("random corpus matches reference; partition-independent") {
    val rnd = new Random(7)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def sentence(): String =
      Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" ")
    val corpus = (1L until 40L).map(i => i -> sentence())
    val queries = Seq(1 -> "a d", 2 -> "h", 3 -> "b c e")
    val want = expected(corpus, queries, k = 5)
    assert(run(docs(corpus: _*), queries, k = 5) === want)
    assert(run(docs(corpus: _*).repartition(7), queries, k = 5) === want)
  }

  test("bad arguments are rejected") {
    intercept[IllegalArgumentException] {
      Bm25.topK(docs(1L -> "a"), "doc_id", "text", Seq.empty, 3)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(docs(1L -> "a"), "doc_id", "text", Seq(1 -> "a"), 0)
    }
  }
}
