package graft.dedup

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class IncrementalSpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 2),
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("drops corpus matches and within-batch later occurrences") {
    val existing = frame((1L, "alpha"), (2L, "beta"))
    val incoming = frame(
      (10L, "alpha"),        // in corpus -> dropped
      (11L, "gamma"),        // novel
      (12L, "gamma"),        // batch dup -> dropped
      (13L, "delta"))
    assert(ids(Incremental.dedupIncrement(existing, incoming, "id", "text")) ===
      Seq(11L, 13L))
  }

  test("normalization-invariant: case and whitespace match the corpus") {
    val existing = frame((1L, "Hello   World"))
    val incoming = frame((10L, "hello world"), (11L, "hello worlds"))
    assert(ids(Incremental.dedupIncrement(existing, incoming, "id", "text")) ===
      Seq(11L))
  }

  test("sequential application equals one-shot on the concatenated batch") {
    val existing = frame((1L, "seed"))
    val a = frame((10L, "x"), (11L, "y"))
    val b = frame((20L, "y"), (21L, "z"), (22L, "seed"))
    val oneShot = Incremental.dedupIncrement(existing, a.union(b), "id", "text")
    val stepA = Incremental.dedupIncrement(existing, a, "id", "text")
    val stepB = Incremental.dedupIncrement(existing.union(stepA), b, "id", "text")
    assert(ids(stepA.union(stepB)) === ids(oneShot))
  }

  test("versionDiff labels fingerprints added/removed/kept") {
    val v1 = frame((1L, "a"), (2L, "b"), (3L, "b"))      // fps: a, b
    val v2 = frame((10L, "b"), (11L, "c"), (12L, "C"))   // fps: b, c (norm: C==c)
    val got = Incremental.versionDiff(v1, v2, "text")
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("removed" -> 1L, "kept" -> 1L, "added" -> 1L))
  }

  test("all original incoming columns survive") {
    val existing = frame((1L, "alpha"))
    val incoming = frame((10L, "beta"))
    val got = Incremental.dedupIncrement(existing, incoming, "id", "text")
    assert(got.columns.toSeq === Seq("id", "text"))
    assert(got.collect().head.getString(1) === "beta")
  }
}
