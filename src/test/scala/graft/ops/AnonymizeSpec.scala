package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Ladder semantics: least qualifying level wins, full suppression
  * terminates, and the published census is exactly that level's.
  */
class AnonymizeSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def people = Seq(
    ("us", "a"), ("us", "a"), ("us", "b"),
    ("fr", "a"), ("fr", "a"), ("fr", "a")).toDF("geo", "seg")

  private def ladder = Seq(
    Seq(col("geo").as("g_geo"), col("seg").as("g_seg")),
    Seq(col("geo").as("g_geo"), lit("*").as("g_seg")),
    Seq(lit("*").as("g_geo"), lit("*").as("g_seg")))

  test("picks the least level whose min class reaches k") {
    // k=2: level 0 has class (us, b) of size 1 -> level 1 (min 3)
    val got = Anonymize.kAnonLadder(people, ladder, k = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == Set((1, "us", "*", 3L), (1, "fr", "*", 3L)))
  }

  test("k=1 publishes the raw census; k=rowcount needs full suppression") {
    val lvl0 = Anonymize.kAnonLadder(people, ladder, k = 1)
    assert(lvl0.select("level").distinct().head().getInt(0) == 0)
    assert(lvl0.count() == 3) // (us,a) (us,b) (fr,a)
    val top = Anonymize.kAnonLadder(people, ladder, k = 6).collect()
    assert(top.map(r => (r.getInt(0), r.getLong(3))).toSeq == Seq((2, 6L)))
  }

  test("an unsatisfiable k over a truncated ladder returns empty, not garbage") {
    val got = Anonymize.kAnonLadder(people, ladder.take(2), k = 5)
    assert(got.isEmpty)
  }

  // (geo, seg) quasi-identifiers with a sensitive diagnosis column:
  // the fr class is large but HOMOGENEOUS in dx
  private def patients = Seq(
    ("us", "a", "flu"), ("us", "a", "cold"), ("us", "b", "flu"),
    ("fr", "a", "flu"), ("fr", "a", "flu"), ("fr", "a", "flu"))
    .toDF("geo", "seg", "dx")

  test("l-diversity skips a k-anonymous level whose class is homogeneous") {
    // k=2 alone would publish level 1 (both geo classes of size 3),
    // but fr's class has ONE distinct dx — the homogeneity attack —
    // so l=2 forces full suppression
    val kOnly = Anonymize.kAnonLadder(patients, ladder, k = 2)
    assert(kOnly.select("level").distinct().head().getInt(0) == 1)
    val got = Anonymize.lDiverseLadder(
      patients, ladder, col("dx"), k = 2, l = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((2, "*", 6L, 2L)))
  }

  test("erasurePlan: per-shard hit accounting and the rewrite verdict") {
    import org.apache.spark.sql.functions._
    val data = Seq((0L, 1L), (0L, 2L), (0L, 2L), (1L, 3L), (2L, 4L))
      .toDF("shard", "uid")
    val dels = Seq(2L, 4L, 99L).toDF("uid") // 99 hits nothing
    val got = Anonymize.erasurePlan(data, col("shard"), "uid", dels)
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (0L, 3L, 2L, true), (1L, 1L, 0L, false), (2L, 1L, 1L, true)))
  }

  test("erasurePlan: duplicate delete requests don't double-count hits") {
    import org.apache.spark.sql.functions._
    val data = Seq((0L, 1L), (0L, 1L)).toDF("shard", "uid")
    val dels = Seq(1L, 1L, 1L).toDF("uid")
    val got = Anonymize.erasurePlan(data, col("shard"), "uid", dels)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 2L)))
  }

  test("l=1 reduces l-diversity to plain k-anonymity") {
    val kA = Anonymize.kAnonLadder(patients, ladder, k = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val lD = Anonymize.lDiverseLadder(patients, ladder, col("dx"), k = 2, l = 1)
      .drop("n_sensitive").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(kA == lD)
  }
}
