package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class NormalizeTextSpec extends AnyFunSuite with SparkSpec {

  // explicit escapes - raw glyphs in source would be byte-ambiguous
  private val decomposed = "cafe\u0301 u\u0308ber" // e + combining acute, u + diaeresis
  private val composed = "caf\u00e9 \u00fcber"     // precomposed

  private def df(rows: String*) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows.map(Row(_)), 2),
    StructType(Seq(StructField("s", StringType, nullable = true))))

  test("NFC composes, NFD decomposes, NFKC folds compatibility forms") {
    val out = df(decomposed)
      .select(
        NormalizeText.normalize_text(col("s")).as("nfc"),
        NormalizeText.normalize_text(col("s"), "NFD").as("nfd"),
        NormalizeText.normalize_text(lit("\uFB01le \uFF28\uFF29"), "NFKC").as("nfkc"))
      .collect()(0)
    assert(out.getString(0) === composed)
    assert(out.getString(1) === decomposed)
    assert(out.getString(2) === "file HI") // fi-ligature + fullwidth letters
    // idempotent, and agrees with java.text.Normalizer directly
    assert(java.text.Normalizer.normalize(decomposed,
      java.text.Normalizer.Form.NFC) === composed)
    val twice = df(composed)
      .select(NormalizeText.normalize_text(col("s"))).collect()(0).getString(0)
    assert(twice === composed)
  }

  test("dedup motivation: fingerprints differ pre-normalization, agree post") {
    val pre = df(decomposed, composed)
      .select(md5(col("s").cast("binary"))).collect().map(_.getString(0))
    assert(pre(0) !== pre(1))
    val post = df(decomposed, composed)
      .select(md5(NormalizeText.normalize_text(col("s")).cast("binary")))
      .collect().map(_.getString(0))
    assert(post(0) === post(1))
  }

  test("null passthrough; SQL registration; bad form rejected") {
    val out = df(null.asInstanceOf[String])
      .select(NormalizeText.normalize_text(col("s"))).collect()(0)
    assert(out.isNullAt(0))
    NormalizeText.register(spark)
    df(decomposed).createOrReplaceTempView("nt")
    assert(spark.sql("SELECT nfc_normalize(s) FROM nt")
      .collect()(0).getString(0) === composed)
    intercept[IllegalArgumentException] {
      NormalizeText.normalize_text(col("s"), "NFX")
    }
  }
}
