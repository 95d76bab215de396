package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class UnigramSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("viterbi picks the cheaper multi-char piece over singles") {
    // "ab" costs 2; singles a=5, b=5 -> path "ab" wins (2 < 10)
    val costs = Map("ab" -> 2L, "a" -> 5L, "b" -> 5L)
    assert(Unigram.viterbi("abab", costs, 4) === (4L, 2L))
    // one split forced through a single: "aba" = ab+a = 7 (vs a+b+a=15)
    assert(Unigram.viterbi("aba", costs, 4) === (7L, 2L))
  }

  test("equal-cost paths break ties toward fewer pieces") {
    // "ab"=10 vs a+b=5+5=10: same cost, 1 piece < 2 pieces
    val costs = Map("ab" -> 10L, "a" -> 5L, "b" -> 5L)
    assert(Unigram.viterbi("ab", costs, 4) === (10L, 1L))
  }

  test("OOV singles price at Big; long words fall back per character") {
    assert(Unigram.viterbi("xy", Map("x" -> 1L), 4) === (1L + Unigram.Big, 2L))
    val long = "a" * (Unigram.MaxLen + 1)
    assert(Unigram.viterbi(long, Map("a" -> 1L), 4) ===
      (31L * Unigram.Big, 31L))
  }

  test("byte fallback: OOV glyphs decompose into UTF-8 byte pieces") {
    val bc = Unigram.ByteCost
    // 'µ' U+00B5 = 2 bytes, '€' U+20AC = 3, U+1D11E = 4 (surrogate
    // pair in UTF-16 — still one DP position, four byte pieces)
    val clef = new String(Character.toChars(0x1D11E))
    assert(Unigram.viterbi("µ", Map.empty, 4, byteFallback = true) ===
      (2L * bc, 2L))
    assert(Unigram.viterbi("a€" + clef, Map("a" -> 5L), 4,
      byteFallback = true) === (5L + 3L * bc + 4L * bc, 1L + 3L + 4L))
    // vocab coverage still wins over bytes when cheaper
    assert(Unigram.viterbi("µ", Map("µ" -> 7L), 4, byteFallback = true) ===
      (7L, 1L))
    // long words price as total bytes under fallback
    val long = "é" * (Unigram.MaxLen + 1)
    assert(Unigram.viterbi(long, Map("é" -> 1L), 4, byteFallback = true) ===
      (62L * bc, 62L))
  }

  test("surrogate pairs count as one position") {
    // U+1F600 is one code point (two UTF-16 chars)
    val emoji = new String(Character.toChars(0x1F600))
    assert(Unigram.viterbi(emoji + "a", Map("a" -> 1L), 4)._2 === 2L)
    assert(Unigram.viterbi(emoji, Map(emoji -> 3L), 4) === (3L, 1L))
  }

  test("vocab costs are 1 + Fmax div freq with freq-desc gram-asc ranking") {
    // corpus "aa aa ab": grams a(freq: aa->2 each *2? compute):
    // words: aa(freq 2), ab(freq 1)
    // 1-grams: a: 2*2(from aa)+1(ab)=5, b: 1; 2-grams: aa: 2, ab: 1
    val census = Bpe.wordCensus(docs(1L -> "aa aa ab"), "text")
    val got = Unigram.vocabCosts(census, maxGram = 4, topV = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "aa" -> 3L, "b" -> 6L, "ab" -> 6L))
  }

  test("encodeCost: every token resolves; totals are per-document sums") {
    val d = docs(1L -> "aa ab", 2L -> "aa aa")
    val got = Unigram.encodeCost(d, "doc_id", "text", topV = 10)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // census: aa(3), ab(1); grams: a=7,aa=3,b=1,ab=1 -> Fmax=7
    // costs: a=2, aa=1+7div3=3, b=8, ab=8
    // word aa: min(aa=3#1, a+a=4#2) -> 3,1 ; word ab: min(ab=8#1, a+b=10#2) -> 8,1
    assert(got.toSeq === Seq((1L, 2L, 11L, 2L), (2L, 2L, 6L, 2L)))
  }

  test("viterbiPieces: backtrace concatenates to the word and matches viterbi counts") {
    val costs = Map("a" -> 2L, "aa" -> 3L, "b" -> 8L, "ab" -> 8L)
    for (w <- Seq("aa", "ab", "aab", "abab", "zzz", "aµ€𝄞",
        "a" * (Unigram.MaxLen + 5))) {
      for (fb <- Seq(true, false)) {
        val (cost, pieces) = Unigram.viterbiPieces(w, costs, 4, fb)
        assert(Unigram.decodePieces(pieces) === w, s"w=$w fb=$fb")
        val (c, np) = Unigram.viterbi(w, costs, 4, fb)
        assert(cost === c, s"cost w=$w fb=$fb")
        assert(pieces.length.toLong === np, s"piece count w=$w fb=$fb")
      }
    }
  }

  test("decodePieces: multi-byte glyphs reassemble through the byte buffer") {
    // 𝄞 = 4 UTF-8 bytes (surrogate pair in UTF-16), € = 3, µ = 2
    val (_, pieces) = Unigram.viterbiPieces("µ€𝄞", Map("x" -> 1L), 4, byteFallback = true)
    assert(pieces.length === 9) // 2 + 3 + 4 byte markers
    assert(pieces.forall(p => p.startsWith("<0X") && p.length === 6))
    assert(Unigram.decodePieces(pieces) === "µ€𝄞")
    // markers use uppercase X — lowercased census words can't collide
    assert(Unigram.decodePieces(Seq("<0x41>")) === "<0x41>")
  }
}
