package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** WordPiece: greedy longest-match semantics, continuation marking,
  * the no-backtracking UNK rule, and vocab construction edges.
  */
class WordPieceSpec extends AnyFunSuite with SparkSpec {

  private def seg(w: String, start: Set[String], cont: Set[String]) =
    WordPiece.segmentWord(w, start, cont)

  test("longest match wins at every position") {
    val start = Set("un", "unaff", "u")
    val cont = Set("able", "aff", "ff", "a", "b", "l", "e")
    // start: 'unaff' (5) beats 'un'; then '##able' continuation
    assert(seg("unaffable", start, cont) == ("unaff ##able", false))
  }

  test("greedy failure yields [UNK] — no backtracking") {
    // 'ab' consumes both chars via 'ab'; nothing matches 'c' as a
    // continuation even though 'a'+'##bc' would have worked
    val start = Set("ab", "a")
    val cont = Set("bc")
    assert(seg("abc", start, cont) == ("[UNK]", true))
  }

  test("no match at word start yields [UNK]") {
    assert(seg("zap", Set("x"), Set("a", "p")) == ("[UNK]", true))
  }

  test("char-fallback segmentation marks continuations") {
    val chars = WordPiece.CharPieces.toSet
    assert(seg("dog", chars, chars) == ("d ##o ##g", false))
    assert(seg("a", chars, chars) == ("a", false))
  }

  test("punctuation outside the char set is unreachable") {
    val chars = WordPiece.CharPieces.toSet
    assert(seg("dog,", chars, chars) == ("[UNK]", true))
  }

  test("segmentCensus over a frame matches segmentWord per row") {
    import spark.implicits._
    val docs = Seq((1L, "the cat the cat sat"), (2L, "the mat")).toDF("doc_id", "text")
    val census = Bpe.wordCensus(docs, "text")
    val out = WordPiece.segmentCensus(census, topN = 2)
      .orderBy("word").collect()
    // top-2 words by (freq desc, word asc): 'the'(3), 'cat'(2)
    val start = Set("the", "cat") ++ WordPiece.CharPieces
    val cont = WordPiece.CharPieces.toSet
    out.foreach { r =>
      val (p, u) = WordPiece.segmentWord(r.getString(0), start, cont)
      assert(r.getString(1) == p && r.getBoolean(2) == u)
    }
    assert(out.map(_.getString(0)).toSeq == Seq("cat", "mat", "sat", "the"))
    val mat = out.find(_.getString(0) == "mat").get
    assert(mat.getString(1) == "m ##a ##t")
  }
}
