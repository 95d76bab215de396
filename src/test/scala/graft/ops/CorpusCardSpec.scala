package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.QualityFilters

class CorpusCardSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String, String, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3, r._4)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false),
        StructField("source", StringType, nullable = false),
        StructField("lang", StringType, nullable = false))))

  private val cfg = QualityFilters.Config(minWords = 5)

  private def run(df: DataFrame): Map[String, (Long, Long, Long, Long, Long)] =
    CorpusCard.corpusCard(df, "text", "source", "lang", cfg)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap

  test("inventories, shares, and duplicate rates per source on a planted corpus") {
    val prose = "the cat and the dog have a long walk with friends to be sure"
    val junk = "### ### ### ### ###"
    val rows = Seq(
      // source A: 4 docs — two exact dups (one whitespace-variant:
      // the fingerprint is normalization-invariant), 3 en / 1 de,
      // prose passes the rules, junk fails them
      (1L, prose, "A", "en"),
      (2L, "  " + prose.replace(" ", "  ") + " ", "A", "en"),
      (3L, junk, "A", "en"),
      (4L, prose + " again", "A", "de"),
      // source B: 2 distinct docs, all en, all prose
      (10L, prose, "B", "en"),
      (11L, prose + " more", "B", "en"))
    val got = run(docs(rows: _*))
    // expected pass flags from the spec'd rule layer itself — this
    // test pins the CARD aggregation, QualityFiltersSpec pins rules
    val passes = QualityFilters.withRules(docs(rows: _*), "text", cfg)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.length - 1)).toMap
    val aPass = Seq(1L, 2L, 3L, 4L).count(passes)
    val aTokens = rows.filter(_._3 == "A")
      .map(_._2.trim.split("\\s+").count(_.nonEmpty).toLong).sum
    assert(got("A") === ((4L, aTokens, 750000L,
      aPass.toLong * 1000000L / 4L, 250000L)))
    val bTokens = rows.filter(_._3 == "B")
      .map(_._2.trim.split("\\s+").count(_.nonEmpty).toLong).sum
    val bPass = Seq(10L, 11L).count(passes)
    assert(got("B") === ((2L, bTokens, 1000000L,
      bPass.toLong * 1000000L / 2L, 0L)))
    // sanity on the planted quality split: prose passes, junk fails
    assert(passes(1L) && !passes(3L), s"rule layer moved: $passes")
    // partition independence
    assert(run(docs(rows: _*).repartition(7)) === got)
  }

  test("per-shard censuses merge by re-aggregation; naive union corrupts dup accounting") {
    val text = "the cat and the dog have a long walk with friends to be sure"
    // the duplicate pair STRADDLES the two shards on purpose
    val rows = Seq(
      (1L, text, "A", "en"), (2L, text + " x", "A", "en"),
      (3L, text, "A", "en"), (4L, text + " y", "A", "de"))
    val all = docs(rows: _*)
    val s1 = all.filter(org.apache.spark.sql.functions.col("doc_id") <= 2)
    val s2 = all.filter(org.apache.spark.sql.functions.col("doc_id") > 2)
    def census(df: org.apache.spark.sql.DataFrame) =
      CorpusCard.signalCensus(df, "text", "source", "lang", cfg)
    def card(c: org.apache.spark.sql.DataFrame) =
      CorpusCard.cardFromCensus(c).collect()
        .map(r => r.getString(0) -> r.getLong(5)).toMap // exact_dup_ppm
    val direct = card(census(all))
    assert(direct("A") === 250000L, s"one dup in four docs: $direct")
    val merged = card(CorpusCard.mergeCensus(Seq(census(s1), census(s2))))
    assert(merged === direct)
    val naive = card(census(s1).unionByName(census(s2)))
    assert(naive("A") === 0L,
      "naive union no longer mis-counts — update the mergeCensus scaladoc")
  }
}
