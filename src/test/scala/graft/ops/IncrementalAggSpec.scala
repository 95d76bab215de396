package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The aggregation-homomorphism law behind incremental maintenance:
  * merging per-slice states equals recomputing the union, for any
  * slicing — including overlapping and empty slices.
  */
class IncrementalAggSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def rows = Seq(
    ("a", 100L), ("a", 250L), ("a", -50L),
    ("b", 7L), ("b", 7L), ("c", 1000L)).toDF("k", "cents")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("merge of a 2-way split equals the direct aggregate") {
    val whole = IncrementalAgg.stats(rows, Seq("k"), col("cents"))
    for (m <- 0 to 2) {
      val a = rows.filter(length(col("k")).cast("int") >= 0 &&
        abs(hash(col("k"), col("cents"))) % 3 === m)
      val b = rows.exceptAll(a)
      val merged = IncrementalAgg.merge(
        Seq(IncrementalAgg.stats(a, Seq("k"), col("cents")),
          IncrementalAgg.stats(b, Seq("k"), col("cents"))), Seq("k"))
      assert(asMap(merged) == asMap(whole), s"split residue $m")
    }
  }

  test("a key present in only one slice survives the merge intact") {
    val a = rows.filter(col("k") =!= "c")
    val b = rows.filter(col("k") === "c")
    val merged = IncrementalAgg.merge(
      Seq(IncrementalAgg.stats(a, Seq("k"), col("cents")),
        IncrementalAgg.stats(b, Seq("k"), col("cents"))), Seq("k"))
    assert(asMap(merged)("c") == (1L, 1000L, 1000L, 1000L))
  }

  test("an empty delta is the identity; overlapping slices add multiplicities") {
    val whole = IncrementalAgg.stats(rows, Seq("k"), col("cents"))
    val empty = IncrementalAgg.stats(
      rows.filter(lit(false)), Seq("k"), col("cents"))
    assert(asMap(IncrementalAgg.merge(Seq(whole, empty), Seq("k"))) ==
      asMap(whole))
    // folding the same slice twice doubles counts and sums but
    // leaves min/max alone — the state is a bag summary, not a set
    val doubled = IncrementalAgg.merge(Seq(whole, whole), Seq("k"))
    assert(asMap(doubled)("a") == (6L, 600L, -50L, 250L))
  }

  test("maintainedJoin: the four-term delta algebra equals the direct join, multiplicities included") {
    val a = Seq((1, "x"), (1, "y"), (2, "z"), (3, "w")).toDF("ka", "av")
    val b = Seq((1, 10), (1, 11), (2, 20), (9, 90)).toDF("kb", "bv")
    val direct = a.join(b, col("ka") === col("kb"))
      .groupBy(col("ka")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // slice both sides arbitrarily; the reconstruction must not care
    for (am <- 0 to 1; bm <- 0 to 1) {
      val got = IncrementalAgg.maintainedJoin(
        a.filter(col("av") =!= (if (am == 0) "y" else "z")),
        a.filter(col("av") === (if (am == 0) "y" else "z")),
        b.filter(col("bv") % 2 === bm), b.filter(col("bv") % 2 =!= bm),
        "ka", "kb")
        .groupBy(col("ka")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == direct, s"slicing ($am, $bm)")
    }
    // key 1 fans out 2x2 = 4 — the multiplicity product survives
    assert(direct(1) == 4L)
  }

  test("withMean floor-divides the merged state, matching SQL // on positives") {
    val st = IncrementalAgg.stats(
      rows.filter(col("cents") > 0), Seq("k"), col("cents"))
    val got = IncrementalAgg.withMean(st).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(got == Map("a" -> 175L, "b" -> 7L, "c" -> 1000L))
  }
}
