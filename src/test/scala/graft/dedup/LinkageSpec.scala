package graft.dedup

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LinkageSpec extends AnyFunSuite with SparkSpec {

  // (id, block, name, size, type)
  private def records(rows: (Long, String, String, Int, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, b, n, sz, t) => Row(i, b, n, sz, t) }, 2),
      StructType(Seq(StructField("id", LongType), StructField("blk", StringType),
        StructField("nm", StringType), StructField("sz", IntegerType),
        StructField("tp", StringType))))

  private def run(df: org.apache.spark.sql.DataFrame, threshold: Int) =
    Linkage.scoredPairs(df, "id", "blk", "nm",
      exactCols = Seq("tp"), nearCol = "sz", tol = 1, threshold = threshold)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))

  test("a planted near-duplicate record matches; unrelated ones do not") {
    val got = run(records(
      (1L, "b1", "acme steel bolt", 10, "bolt"),
      (2L, "b1", "acme steel bolts", 10, "bolt"),   // typo twin of 1
      (3L, "b1", "zzz plastic gizmo", 40, "gizmo"),
      (4L, "b2", "acme steel bolt", 10, "bolt")),   // twin of 1, other block
      threshold = 700000)
    assert(got.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
    // jw("acme steel bolt", "acme steel bolts") > 0.9 -> name_sim >
    // 450000, + type 150000 + size 100000 > 700000
    assert(got(0)._3 > 700000L)
  }

  test("blocking is absolute: identical records in different blocks never pair") {
    val got = run(records(
      (1L, "b1", "same name", 5, "t"),
      (2L, "b2", "same name", 5, "t")), threshold = 0)
    assert(got.isEmpty)
  }

  test("each agreement weight contributes independently") {
    val got = run(records(
      (1L, "b", "alpha beta", 5, "x"),
      (2L, "b", "alpha beta", 5, "x"),    // all agree: 500000+150000+100000
      (3L, "b", "alpha beta", 9, "y")),   // name only: 500000
      threshold = 0)
    assert(got.toSeq === Seq(
      (1L, 2L, 750000L), (1L, 3L, 500000L), (2L, 3L, 500000L)))
  }
}
