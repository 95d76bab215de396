package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class UrlsSpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 2),
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))

  test("extracts urls with domains; no-url docs vanish; occurrences kept") {
    val df = frame(
      (1L, "see https://a.example.com/x and http://b.org plus https://a.example.com/x again"),
      (2L, "no links here"),
      (3L, "trailing https://c.net/path?q=1#frag end"))
    val got = Urls.extractUrls(df, "id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(got === Seq(
      (1L, "http://b.org", "b.org"),
      (1L, "https://a.example.com/x", "a.example.com"),
      (1L, "https://a.example.com/x", "a.example.com"),
      (3L, "https://c.net/path?q=1#frag", "c.net")))
  }

  test("sentence punctuation after a bare domain stays out of the host") {
    val df = frame(
      (1L, "see https://example.com. Next sentence."),
      (2L, "mid https://example.com, and more"),
      (3L, "paren (https://example.com/x)."))
    val got = Urls.extractUrls(df, "id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(got === Seq(
      (1L, "https://example.com", "example.com"),
      (2L, "https://example.com", "example.com"),
      // a path swallows trailing punctuation by design (any non-ws run)
      (3L, "https://example.com/x).", "example.com")))
    // one domain, not example.com vs example.com.
    val doms = Urls.domainStats(df, "id", "text").collect()
    assert(doms.length === 1 && doms(0).getString(0) === "example.com")
  }

  test("domain stats: occurrences vs distinct docs") {
    val df = frame(
      (1L, "https://d.com/1 https://d.com/2"),
      (2L, "https://d.com/3"),
      (3L, "https://e.com/"))
    val got = Urls.domainStats(df, "id", "text").orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("d.com", 3L, 2L), ("e.com", 1L, 1L)))
  }
}
