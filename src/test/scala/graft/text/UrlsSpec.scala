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
