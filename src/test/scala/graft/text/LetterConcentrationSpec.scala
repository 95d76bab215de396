package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LetterConcentrationSpec extends AnyFunSuite with SparkSpec {

  private def run(texts: (Long, String)*) = {
    import spark.implicits._
    TextFunctions.letterConcentration(texts.toDF("id", "t"), "id", "t")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
  }

  test("single-letter degenerate text scores 0 ppm") {
    assert(run(1L -> "aaaaaa").toSeq === Seq((1L, 6L, 0L)))
  }

  test("uniform two-letter split scores 500000 ppm; case folds") {
    // N=4, counts (2,2): 1e6*(16-8)/16 = 500000
    assert(run(1L -> "aAbB").toSeq === Seq((1L, 4L, 500000L)))
  }

  test("non-letters are ignored; no letters yields null") {
    assert(run(1L -> "ab12 !?").toSeq === Seq((1L, 2L, 500000L)))
    assert(run(2L -> "123 !?").toSeq === Seq((2L, 0L, -1L)))
  }

  test("spread text scores higher than repeated text") {
    val got = run(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "aaa bbb aaa bbb aaa bbb")
    assert(got(0)._3 > got(1)._3)
  }
}
