package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Specs for the corpus-curation operators added in round 5: PII
  * scrubbing, cross-document boilerplate-line removal, and per-group
  * cap sampling.
  */
class CurationSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  test("Pii.scrub redacts emails, IPv4s and phones, and counts each on the original") {
    val out = Pii.scrub(docs(
      1L -> "mail bob.smith+x@corp.example.org or call 555-123-4567 now",
      2L -> "server at 192.168.0.17 and 10.0.0.1; none else",
      3L -> "clean text with numbers 123 and a dot. nothing more",
    ), "doc_id", "text").collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getString(1) == "mail <EMAIL> or call <PHONE> now")
    assert((out(1L).getInt(2), out(1L).getInt(3), out(1L).getInt(4)) == ((1, 0, 1)))
    assert(out(2L).getString(1) == "server at <IP> and <IP>; none else")
    assert(out(2L).getInt(3) == 2)
    assert(out(3L).getString(1) == "clean text with numbers 123 and a dot. nothing more")
    assert((out(3L).getInt(2), out(3L).getInt(3), out(3L).getInt(4)) == ((0, 0, 0)))
  }

  test("Pii.redact leaves dotted-quad emails to the email pass, not the IP pass") {
    // user@10.0.0.1 has no alpha tld, so the email pattern skips it and
    // the IP pass redacts just the quad — local part survives
    val out = Pii.scrub(docs(1L -> "ssh user@10.0.0.1 fast"), "doc_id", "text")
      .collect()(0)
    assert(out.getString(1) == "ssh user@<IP> fast")
  }

  test("Pii.rateBySource: per-source doc and hit tallies, integer ppm") {
    import spark.implicits._
    val df = Seq(
      ("web", "mail a@b.co and c@d.org"), // flagged, 2 emails
      ("web", "clean"),
      ("web", "host 10.0.0.1"),           // flagged, 1 ip
      ("web", "also clean"),
      ("book", "nothing here"),
    ).toDF("source", "text")
    val got = Pii.rateBySource(df, "source", "text").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got("web") == ((4L, 2L, 2L, 1L, 0L, 500000L)))
    assert(got("book") == ((1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("Pii.cardScan: Luhn separates real card numbers from digit noise") {
    val out = Pii.cardScan(docs(
      1L -> "pay 4111 1111 1111 1111 now",        // valid Visa test
      2L -> "ref 1234-5678-9012-3456 trace",      // fails Luhn
      3L -> "amex 378282246310005 plain",         // 15-digit valid
      4L -> "short 1234 5678 no card",            // too short: no match
      5L -> "two: 4111111111111111 and 1234567890123456 here",
      6L -> "clean text"), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L), (2L, 1L, 0L), (3L, 1L, 1L),
      (4L, 0L, 0L), (5L, 2L, 1L), (6L, 0L, 0L)))
  }

  test("Boilerplate.removeFrequentLines strips lines in >= minDocs docs, keeps the rest") {
    val corpus = docs(
      1L -> "alpha one#FOOTER#beta one",
      2L -> "alpha two#FOOTER#beta two",
      3L -> "alpha three#FOOTER#beta three",
      4L -> "unique#FOOTER#also unique",
    )
    val out = Boilerplate.removeFrequentLines(corpus, "doc_id", "text",
      sep = "#", minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == (("alpha one#beta one", 1)))
    assert(out(4L) == (("unique#also unique", 1)))
  }

  test("Boilerplate: within-doc repeats don't reach minDocs (distinct docs counted)") {
    val corpus = docs(
      1L -> "SAME#SAME#SAME#keep a",
      2L -> "keep b#other",
    )
    val out = Boilerplate.removeFrequentLines(corpus, "doc_id", "text",
      sep = "#", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // SAME occurs 3x but in one doc only — survives
    assert(out(1L) == "SAME#SAME#SAME#keep a")
    assert(out(2L) == "keep b#other")
  }

  test("Boilerplate: no frequent lines leaves every document unchanged") {
    val corpus = docs(1L -> "a#b", 2L -> "c#d")
    val out = Boilerplate.removeFrequentLines(corpus, "doc_id", "text",
      sep = "#", minDocs = 2)
      .collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out.toSet == Set(("a#b", 0), ("c#d", 0)))
  }

  test("Boilerplate: maxFreqLines guard fails fast on a degenerate corpus") {
    val corpus = docs(
      1L -> "x#y#z", 2L -> "x#y#z", 3L -> "x#y#z")
    val ex = intercept[Exception] {
      Boilerplate.removeFrequentLines(corpus, "doc_id", "text",
        sep = "#", minDocs = 2, maxFreqLines = 2).collect()
    }
    assert(ex.getMessage.contains("maxFreqLines") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxFreqLines")))
  }

  test("Sampling.capPerGroup keeps small groups whole and caps the big one") {
    import graft.ops.Sampling
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("grp", StringType, nullable = false)))
    val rows = (0L until 2000L).map(i => Row(i, "big")) ++
      (2000L until 2020L).map(i => Row(i, "small"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8), schema)

    val kept = Sampling.capPerGroup(df, "grp", "id", cap = 100)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 20L, "groups under the cap keep every row")
    // expected 100 of 2000; md5 buckets are uniform — allow wide noise
    assert(kept("big") > 50L && kept("big") < 200L, s"got ${kept("big")}")

    // membership is a pure function of (seed, id): repartitioning
    // cannot change the kept set
    val ids1 = Sampling.capPerGroup(df, "grp", "id", cap = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.capPerGroup(df.repartition(17), "grp", "id", cap = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("Sampling.capPerGroup treats a NULL group as a group, not a casualty") {
    import graft.ops.Sampling
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("grp", StringType, nullable = true)))
    val rows = (0L until 5L).map(i => Row(i, null)) ++
      (5L until 10L).map(i => Row(i, "a"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    // both groups are under the cap: every row survives, NULLs included
    val kept = Sampling.capPerGroup(df, "grp", "id", cap = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 10L).toSet)
  }

  test("reserved-column guards: capPerGroup and removeFrequentLines reject colliding inputs") {
    import graft.ops.Sampling
    val df = docs(1L -> "a#b").withColumn("__n_group", lit(1L))
    intercept[IllegalArgumentException] {
      Sampling.capPerGroup(df, "text", "doc_id", cap = 1)
    }
    val df2 = docs(1L -> "a#b").withColumn("__kept", lit(1))
    intercept[IllegalArgumentException] {
      Boilerplate.removeFrequentLines(df2, "doc_id", "text", "#", 2)
    }
  }
}
