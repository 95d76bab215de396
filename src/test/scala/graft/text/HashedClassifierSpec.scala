package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hashing-trick classifier: feature construction (unigrams +
  * adjacent bigrams), determinism, edge docs, and the census
  * arithmetic.
  */
class HashedClassifierSpec extends AnyFunSuite with SparkSpec {

  test("n_grams counts unigrams plus adjacent bigrams") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "solo"), (3L, "  "), (4L, "x  y"))
      .toDF("doc_id", "text")
    val out = HashedClassifier.score(df, "doc_id", "text")
      .orderBy("id").collect()
    // "a b c": 3 unigrams + 2 bigrams; "solo": 1 + 0; "": absent;
    // double-space "x  y" still tokenizes to 2 + 1
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 5L), (2L, 1L), (4L, 3L)))
  }

  test("score is the exact mean of per-gram weights") {
    import spark.implicits._
    val df = Seq((7L, "alpha beta")).toDF("doc_id", "text")
    val out = HashedClassifier.score(df, "doc_id", "text").head()
    // independent recomputation: 3 grams (alpha, beta, alpha_beta)
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    def w(g: String): Long = h(s"w:${h(g) % 4096}") % 2001 - 1000
    val wsum = Seq("alpha", "beta", "alpha_beta").map(w).sum
    assert(out.getLong(1) == 3L)
    assert(out.getLong(2) == wsum)
    assert(out.getDouble(3) == wsum.toDouble / 3.0)
  }

  test("identical texts score identically; case-insensitive") {
    import spark.implicits._
    val df = Seq((1L, "The Quick Fox"), (2L, "the quick fox"))
      .toDF("doc_id", "text")
    val out = HashedClassifier.score(df, "doc_id", "text")
      .select("w_sum").distinct().count()
    assert(out == 1L)
  }
}
