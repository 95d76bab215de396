package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class VocabSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  test("topTokens counts corpus and document frequency, lowercased") {
    val out = Vocab.topTokens(
      docs(1L -> "The cat sat", 2L -> "the cat ran", 3L -> "a dog ran ran"),
      "doc_id", "text", k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("the") == (2L, 2L))
    assert(out("cat") == (2L, 2L))
    assert(out("ran") == (3L, 2L)) // 3 occurrences in 2 docs
    assert(out("a") == (1L, 1L))
  }

  test("the k-cut is deterministic: frequency desc then term asc") {
    // four tokens with frequency 1 — the cut at k=2 must take the
    // lexicographically smallest terms, whatever the partitioning
    val d = docs(1L -> "delta bravo", 2L -> "charlie alpha")
    val terms = Vocab.topTokens(d, "doc_id", "text", k = 2)
      .collect().map(_.getString(0)).toSeq
    assert(terms == Seq("alpha", "bravo"))
    val reparted = Vocab.topTokens(d.repartition(7), "doc_id", "text", k = 2)
      .collect().map(_.getString(0)).toSeq
    assert(reparted == terms)
  }

  test("oovRate counts tokens outside the vocabulary; empty docs rate 0") {
    val vocab = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("cat"), Row("the")), 2),
      StructType(Seq(StructField("term", StringType, nullable = false))))
    val out = Vocab.oovRate(
      docs(1L -> "the cat xyzzy", 2L -> "THE CAT", 3L -> "  "),
      "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(out(1L) == (3, 1, 1.0 / 3))
    assert(out(2L) == (2, 0, 0.0)) // lowercased before lookup
    assert(out(3L) == (0, 0, 0.0)) // empty doc: rate 0, not NaN
  }

  test("an empty vocabulary rates every token OOV (matches the coalesced oracle)") {
    val emptyVocab = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 1),
      StructType(Seq(StructField("term", StringType, nullable = false))))
    val out = Vocab.oovRate(docs(1L -> "a b c"), "doc_id", "text", emptyVocab)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getDouble(3))).toMap
    assert(out(1L) == (3, 1.0))
  }

  test("encode assigns rank ids (count desc, term asc), 0 for OOV, flattened") {
    // counts: ran=3, cat=2, the=2 -> ranks: ran=1, cat=2, the=3 (cat < the)
    val corpus = docs(1L -> "The cat sat", 2L -> "the cat ran", 3L -> "a dog ran ran")
    val vocab = Vocab.topTokens(corpus, "doc_id", "text", k = 3)
    val out = Vocab.encode(docs(10L -> "ran THE zebra", 11L -> ""), "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    // zebra is OOV -> 0; empty doc 11 emits nothing
    assert(out === Seq((10L, 0, 1L), (10L, 1, 3L), (10L, 2, 0L)))
  }

  test("encode ids are independent of vocab frame partitioning") {
    val corpus = docs(1L -> "b b a a c", 2L -> "d e f")
    val v1 = Vocab.topTokens(corpus, "doc_id", "text", k = 4)
    val enc1 = Vocab.encode(corpus, "doc_id", "text", v1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val enc2 = Vocab.encode(corpus, "doc_id", "text", v1.repartition(5))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(enc1 === enc2)
  }

  test("encode map lookup agrees with the linear-scan formulation on a 10k-term vocab") {
    import org.apache.spark.sql.functions._
    // 10k distinct terms with distinct counts -> every rank exercised
    val vocab = spark.range(10000).select(
      concat(lit("t"), format_string("%05d", col("id"))).as("term"),
      (lit(20000L) - col("id")).as("n_total"))
    // probes hit low ranks, high ranks, and OOV
    val corpus = docs(
      1L -> "t00000 t09999 t05000 zzz-oov",
      2L -> "T00042 t00042 nope",
      3L -> "")
    val viaMap = Vocab.encode(corpus, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaScan = Vocab.encodeViaScan(corpus, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaMap === viaScan)
    // and the ids are the ranks the count order implies
    assert(viaMap.contains((1L, 0, 1L)))     // t00000 = highest count
    assert(viaMap.contains((1L, 1, 10000L))) // t09999 = lowest count
    assert(viaMap.contains((1L, 3, 0L)))     // OOV
  }

  test("oovRate tolerates duplicate terms in the vocab frame") {
    val vocab = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("cat"), Row("cat"), Row("the")), 2),
      StructType(Seq(StructField("term", StringType, nullable = false))))
    val out = Vocab.oovRate(docs(1L -> "the cat xyzzy"), "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == (3, 1))
  }

  test("tokenRarity ranks tokens (OOV = k+1), empty docs score zero") {
    import spark.implicits._
    // vocab: "the"(rank 1, n=5), "cat"(rank 2, n=3), "ant"(rank 3, n=3
    // — count tie broken term-asc: ant < cat? no: ant(3) and cat(3)
    // tie -> ant rank 2, cat rank 3)
    val vocab = Seq(("the", 5L), ("cat", 3L), ("ant", 3L))
      .toDF("term", "n_total")
    val out = Vocab.tokenRarity(
      docs(1L -> "the cat zebra", 2L -> "", 3L -> "zebra zebra"),
      "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))).toMap
    // ranks: the=1, ant=2, cat=3; k=3 so OOV=4
    assert(out(1L) == ((3, 1, 1L + 3L + 4L, 8.0 / 3.0)))
    assert(out(2L) == ((0, 0, 0L, 0.0)))
    assert(out(3L) == ((2, 2, 8L, 4.0)))
  }

  test("tokenRarity keeps the best rank for duplicate vocab terms") {
    import spark.implicits._
    val vocab = Seq(("a", 9L), ("b", 5L), ("a", 5L)).toDF("term", "n_total")
    val out = Vocab.tokenRarity(docs(1L -> "a b z"), "doc_id", "text", vocab)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).head
    // ranks: a=1 (best of 1 and 2), b=3; k = greatest ASSIGNED rank = 3,
    // so OOV z = 4
    assert(out == ((3, 1, 1L + 3L + 4L)))
  }

  test("guards: k must be positive, reserved columns rejected") {
    intercept[IllegalArgumentException] {
      Vocab.topTokens(docs(1L -> "a"), "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Vocab.oovRate(
        docs(1L -> "a").withColumnRenamed("text", "__toks"),
        "doc_id", "__toks",
        docs(1L -> "a").select(org.apache.spark.sql.functions.col("text").as("term")))
    }
  }

  test("lexicalDiversity: hand-counted types, hapax, ppm floors") {
    import spark.implicits._
    val d = Seq(
      ("s1", "the cat the mat"),   // tokens 4, types 3 (the×2), hapax 2
      ("s1", "the dog"),           // s1 total: 6 tokens, types {the,cat,mat,dog}=4, hapax {cat,mat,dog}=3
      ("s2", "x x x"),             // low TTR: 3 tokens, 1 type, 0 hapax
    ).toDF("source", "text")
    val out = Vocab.lexicalDiversity(d, "source", "text").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("s1") == (6L, 4L, 3L, 666666L, 500000L))
    assert(out("s2") == (3L, 1L, 0L, 333333L, 0L))
  }
}
