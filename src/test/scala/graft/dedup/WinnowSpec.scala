package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class WinnowSpec extends AnyFunSuite with SparkSpec {

  private def docs(parts: Int, rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), parts),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  private def fps(df: DataFrame, k: Int, w: Int) =
    Winnow.fingerprints(df, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

  test("winnowing guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    val k = 5; val w = 4
    val shared = "zqxjkvwpbty_shared_run_mnbvcxz"
    assert(shared.length >= k + w - 1)
    val a = "first document prefix " + shared + " and then a tail"
    val b = "other text here " + shared + " different ending part"
    val out = fps(docs(3, 1L -> a, 2L -> b), k, w)
    val fpA = out.collect { case (1L, _, h) => h }.toSet
    val fpB = out.collect { case (2L, _, h) => h }.toSet
    assert((fpA & fpB).nonEmpty,
      s"no shared fingerprint for a ${shared.length}-char shared run")
  }

  test("hash ties select the rightmost position of each window") {
    // all grams of a uniform string are identical -> every window's
    // min ties on the hash and must take the window's LAST position:
    // selected positions are exactly w-1 .. nGrams-1
    val k = 3; val w = 4
    val text = "a" * 12 // 10 grams, positions 0..9
    val out = fps(docs(2, 7L -> text), k, w).sortBy(_._2)
    assert(out.map(_._2).toSeq === (w - 1 to 9).toSeq)
    assert(out.map(_._3).distinct.length === 1)
  }

  test("documents without a full window produce no fingerprints") {
    val out = fps(docs(2,
      1L -> "short",        // 5 chars: zero 8-grams
      2L -> "exactly11ch"), // 4 grams < window 8
      8, 8)
    assert(out.isEmpty)
  }

  test("shared-fingerprint pairs find the overlapping pair, not the disjoint one") {
    val k = 5; val w = 4
    val shared = "the same exact paragraph appears in both of these documents verbatim"
    val d = docs(3,
      1L -> ("intro text " + shared + " closing words"),
      2L -> ("different opening " + shared + " other tail"),
      3L -> "entirely unrelated content with nothing in common qqq")
    val out = Winnow.sharedFingerprintPairs(
        d, "doc_id", "text", k, w, minShared = 2, maxFpDocs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L)))
  }

  test("the hot-fingerprint guard drops ubiquitous spans") {
    val k = 5; val w = 4
    val boiler = "COMMON FOOTER BOILERPLATE SHARED BY EVERY SINGLE DOCUMENT"
    val d = docs(2,
      1L -> ("alpha one " + boiler),
      2L -> ("beta two " + boiler),
      3L -> ("gamma three " + boiler))
    val exact = Winnow.sharedFingerprintPairs(
      d, "doc_id", "text", k, w, minShared = 1, maxFpDocs = 0L).count()
    val guarded = Winnow.sharedFingerprintPairs(
      d, "doc_id", "text", k, w, minShared = 1, maxFpDocs = 2L).count()
    assert(exact === 3L) // all pairs share the boilerplate
    // fps selected in ALL 3 docs exceed the cap and drop; a junction
    // fp picked in only 2 docs (selection context differs near the
    // distinct prefixes) may legitimately survive — the guard bounds
    // the blow-up, it does not promise zero boilerplate pairs
    assert(guarded < exact,
      s"guard dropped nothing: exact=$exact guarded=$guarded")
  }

  test("selection is independent of input partitioning and is a gram subsample") {
    val text = (1 to 60).map(i => s"sentence piece number $i with content.").mkString(" ")
    val one = fps(docs(1, 5L -> text), 8, 8).sorted.toSeq
    val many = fps(docs(7, 5L -> text), 8, 8).sorted.toSeq
    assert(one === many)
    val nGrams = text.length - 7
    assert(one.nonEmpty && one.length < nGrams / 2,
      s"${one.length} selections from $nGrams grams — not a sparse sample")
    // every fingerprint is the hash of the gram at its position
    one.take(20).foreach { case (_, pos, fp) =>
      val gram = text.substring(pos, pos + 8)
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(gram).substring(0, 7), 16)
      assert(h === fp, s"fingerprint at $pos is not the gram hash")
    }
  }
}
