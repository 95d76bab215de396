package graft.dedup

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SubstrSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  /** Independent char-level reference: a maximal anchor island on a
    * diagonal is exactly a maximal run of equal characters of length
    * `>= k` at that alignment, reported at its char length.
    */
  private def expected(
      rows: Seq[(Long, String)], k: Int, minLen: Int,
  ): Set[(Long, Long, Int, Int, Int)] = {
    val out = scala.collection.mutable.Set[(Long, Long, Int, Int, Int)]()
    for {
      (ida, ta) <- rows; (idb, tb) <- rows if ida < idb
      d <- -(tb.length - 1) to (ta.length - 1)
    } {
      // positions i in a (0-based) aligned with i - d in b
      var i = math.max(0, d)
      val end = math.min(ta.length, tb.length + d)
      while (i < end) {
        if (ta(i) == tb(i - d)) {
          var j = i
          while (j < end && ta(j) == tb(j - d)) j += 1
          val len = j - i
          if (len >= k && len >= minLen)
            out += ((ida, idb, i + 1, i - d + 1, len))
          i = j
        } else i += 1
      }
    }
    out.toSet
  }

  private def run(
      df: DataFrame, k: Int, minLen: Int,
      maxGramDocs: Int = 0, joinOnDigest: Boolean = true,
  ): Set[(Long, Long, Int, Int, Int)] =
    Substr.sharedRuns(df, "doc_id", "text", k, minLen, maxGramDocs, joinOnDigest)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
      .toSet

  test("recovers a planted shared span with exact offsets") {
    val span = "the quick brown fox jumps over the lazy dog"
    val rows = Seq(
      1L -> s"AAAA $span BBBB",
      2L -> s"CCCCCCCCCC $span",
      3L -> "completely unrelated content here xyzw")
    val got = run(docs(rows: _*), k = 10, minLen = 20)
    assert(got === expected(rows, k = 10, minLen = 20))
    // the planted span itself: doc1 offset 6, doc2 offset 12, len 44+1 pad?
    assert(got.exists { case (a, b, sa, sb, len) =>
      a == 1L && b == 2L && len >= span.length })
  }

  test("periodic text reports runs on several diagonals; digest and literal joins agree") {
    val rows = Seq(
      1L -> ("ab" * 30), // 60 chars of period-2 text
      2L -> ("ab" * 20),
      3L -> "zzzzzzzzzzzzzzzzzzzzzzzz")
    val want = expected(rows, k = 8, minLen = 16)
    val got = run(docs(rows: _*), k = 8, minLen = 16)
    assert(got === want)
    assert(got.map(_.productIterator.mkString(",")).size > 1) // multiple alignments
    assert(run(docs(rows: _*), k = 8, minLen = 16, joinOnDigest = false) === want)
  }

  test("random corpus with planted overlaps matches the char-level reference") {
    val rnd = new Random(11)
    def rand(n: Int): String =
      Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString // small alphabet: natural collisions
    val shared = rand(35)
    val rows = (1L to 8L).map { i =>
      i -> (if (i % 3 == 0) rand(20) + shared + rand(15) else rand(60))
    }
    val k = 12; val minLen = 24
    assert(run(docs(rows: _*), k, minLen) === expected(rows, k, minLen))
    assert(run(docs(rows: _*).repartition(5), k, minLen) ===
      expected(rows, k, minLen))
  }

  test("BMP unicode text: offsets and lengths count code points, not bytes") {
    // multi-byte chars (2-3 UTF-8 bytes each) — a byte-indexed substr
    // would report shifted offsets and shorter runs
    val span = "caf\u00e9 \u00fcber d\u65e5\u672c\u8a9e caf\u00e9 wie"
    val rows = Seq(
      1L -> ("\u03b1\u03b2 " + span + " xx"),
      2L -> ("yyyyy " + span),
      3L -> "plain ascii filler text")
    val k = 8; val minLen = 12
    val got = run(docs(rows: _*), k, minLen)
    assert(got === expected(rows, k, minLen))
    assert(got.exists { case (a, b, _, _, len) =>
      a == 1L && b == 2L && len >= span.length })
    assert(runClean(docs(rows: _*), k, minLen) ===
      expectedClean(rows, k, minLen))
  }

  /** Char-level reference for within-document repeats: maximal runs
    * of `t(i) == t(i+d)` per shift d > 0.
    */
  private def expectedSelf(
      rows: Seq[(Long, String)], k: Int, minLen: Int,
  ): Set[(Long, Int, Int, Int)] = {
    val out = scala.collection.mutable.Set[(Long, Int, Int, Int)]()
    for ((id, t) <- rows; d <- 1 until t.length) {
      var i = 0
      while (i < t.length - d) {
        if (t(i) == t(i + d)) {
          var j = i
          while (j < t.length - d && t(j) == t(j + d)) j += 1
          val len = j - i
          if (len >= k && len >= minLen) out += ((id, i + 1, i + 1 + d, len))
          i = j
        } else i += 1
      }
    }
    out.toSet
  }

  private def runSelf(
      df: DataFrame, k: Int, minLen: Int, maxGramRepeats: Int = 0,
  ): Set[(Long, Int, Int, Int)] =
    Substr.selfRuns(df, "doc_id", "text", k, minLen, maxGramRepeats)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet

  test("selfRuns finds within-document repeats with exact offsets") {
    val phrase = "REPEATED-BOILERPLATE-PHRASE"
    val rows = Seq(
      1L -> s"intro $phrase middle $phrase end",
      2L -> "no repeats in this document at all x",
      3L -> ("ab" * 20)) // periodic: one run per period alignment
    val k = 10; val minLen = 15
    val got = runSelf(docs(rows: _*), k, minLen)
    assert(got === expectedSelf(rows, k, minLen))
    assert(got.exists { case (id, _, _, len) =>
      id == 1L && len >= phrase.length })
    assert(!got.exists(_._1 == 2L))
    assert(got.count(_._1 == 3L) > 1)
  }

  test("selfRuns matches the reference on random text; repeat guard censors") {
    val rnd = new Random(31)
    def rand(n: Int): String =
      Seq.fill(n)(('a' + rnd.nextInt(3)).toChar).mkString
    val rows = (1L to 8L).map(i => i -> rand(70))
    val k = 6; val minLen = 9
    assert(runSelf(docs(rows: _*), k, minLen) === expectedSelf(rows, k, minLen))
    assert(runSelf(docs(rows: _*).repartition(5), k, minLen) ===
      expectedSelf(rows, k, minLen))
    // degenerate page: every anchor identical -> the cap kills the runs
    val degen = Seq(9L -> ("z" * 60))
    assert(runSelf(docs(degen: _*), k, minLen).nonEmpty)
    assert(runSelf(docs(degen: _*), k, minLen, maxGramRepeats = 5).isEmpty)
  }

  test("hot-gram guard drops runs through ubiquitous anchors") {
    val boiler = "SHARED-BOILERPLATE-FOOTER-TEXT"
    val rows = (1L to 6L).map(i => i -> s"doc$i unique-$i $boiler")
    val full = run(docs(rows: _*), k = 10, minLen = 20)
    assert(full.nonEmpty)
    // every doc carries the anchor -> guard at 3 kills those runs
    val guarded = run(docs(rows: _*), k = 10, minLen = 20, maxGramDocs = 3)
    assert(guarded.isEmpty)
  }

  /** Independent apply reference: cut merged [start_b, start_b+len-1]
    * spans (higher id of each pair) out of the text.
    */
  private def expectedClean(
      rows: Seq[(Long, String)], k: Int, minLen: Int,
  ): Map[Long, (Int, Int, String)] = {
    val spans = expected(rows, k, minLen).toSeq
      .map { case (_, b, _, sb, len) => b -> ((sb, sb + len - 1)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.map { case (id, text) =>
      val merged = spans.getOrElse(id, Nil).sorted
        .foldLeft(List.empty[(Int, Int)]) {
          case ((plo, phi) :: rest, (lo, hi)) if lo <= phi =>
            (plo, math.max(phi, hi)) :: rest
          case (acc, s) => s :: acc
        }.reverse
      val clean = (1 to text.length)
        .filterNot(p => merged.exists(m => p >= m._1 && p <= m._2))
        .map(p => text(p - 1)).mkString
      id -> ((merged.size, text.length - clean.length, clean))
    }.toMap
  }

  private def runClean(
      df: DataFrame, k: Int, minLen: Int,
  ): Map[Long, (Int, Int, String)] =
    Substr.removeSharedSpans(df, "doc_id", "text", k, minLen)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap

  test("removeSharedSpans cuts the later copy, keeps the first, leaves the rest") {
    val span = "the quick brown fox jumps over the lazy dog again and again"
    val rows = Seq(
      1L -> s"AAAA $span BBBB",
      2L -> s"CCCCCCCCCC $span DDDD",
      3L -> "completely unrelated content here xyzw")
    val want = expectedClean(rows, k = 10, minLen = 20)
    val got = runClean(docs(rows: _*), k = 10, minLen = 20)
    assert(got === want)
    assert(got(1L)._1 === 0)            // first occurrence untouched
    assert(got(2L)._1 >= 1)             // later copy lost the span
    assert(!got(2L)._3.contains(span))
    assert(got(3L) === ((0, 0, rows(2)._2)))
  }

  test("overlapping runs merge to disjoint spans before cutting (periodic text)") {
    val rows = Seq(
      1L -> ("ab" * 30),
      2L -> ("xy " + ("ab" * 25) + " zw"))
    val want = expectedClean(rows, k = 8, minLen = 16)
    val got = runClean(docs(rows: _*), k = 8, minLen = 16)
    assert(got === want)
    // the whole repeated region collapses to ONE merged span on doc 2
    assert(got(2L)._1 === 1)
    assert(got(2L)._3 === "xy  zw")
  }

  test("random corpus apply matches the reference across partitionings") {
    val rnd = new Random(23)
    def rand(n: Int): String =
      Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
    val shared = rand(30)
    val rows = (1L to 10L).map { i =>
      i -> (if (i % 2 == 0) rand(12) + shared + rand(10) else rand(50))
    }
    val want = expectedClean(rows, k = 10, minLen = 20)
    assert(runClean(docs(rows: _*), k = 10, minLen = 20) === want)
    assert(runClean(docs(rows: _*).repartition(7), k = 10, minLen = 20) === want)
  }

  test("bad arguments are rejected") {
    intercept[IllegalArgumentException] {
      Substr.sharedRuns(docs(1L -> "x"), "doc_id", "text", k = 1, minLen = 5)
    }
    intercept[IllegalArgumentException] {
      Substr.sharedRuns(docs(1L -> "x"), "doc_id", "text", k = 10, minLen = 5)
    }
  }
}
