package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ShufflingSpec extends AnyFunSuite with SparkSpec {

  private def ids(n: Int, parts: Int = 3): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize((0L until n).map(Row(_)), parts),
      StructType(Seq(StructField("doc_id", LongType, nullable = false))))

  private def run(df: DataFrame, seed: Long, partitions: Int = 0): Seq[(Long, String, Long)] =
    Shuffling.shuffleRank(df, "doc_id", seed, partitions)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("rank is a dense 0-based permutation ordered by (key, id)") {
    val out = run(ids(137), seed = 7)
    assert(out.map(_._3).sorted === (0L until 137L))
    val byRank = out.sortBy(_._3)
    assert(byRank === byRank.sortBy(t => (t._2, t._1)))
    // matches an independent sequential reference on the md5 key
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) = md.digest(s"$id:7".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (0L until 137L).map(i => i -> key(i)).sortBy(t => (t._2, t._1))
      .zipWithIndex.map { case ((id, k), r) => (id, k, r.toLong) }
    assert(byRank === want)
  }

  test("order is deterministic in (id, seed) and partitioning-independent") {
    val a = run(ids(80, parts = 2), seed = 42, partitions = 5)
    val b = run(ids(80, parts = 7), seed = 42, partitions = 3)
    assert(a.sortBy(_._1) === b.sortBy(_._1))
    val c = run(ids(80), seed = 43)
    assert(a.sortBy(_._3).map(_._1) !== c.sortBy(_._3).map(_._1),
      "different seeds must produce different orders")
  }

  test("empty input yields empty output") {
    assert(run(ids(0), seed = 1).isEmpty)
  }

  test("negativeSample: ≤k negatives per anchor, no self, deterministic, near-uniform") {
    val corpus = ids(500)
    val anchors = ids(500).filter("doc_id % 50 = 0") // 10 anchors
    val out = Shuffling.negativeSample(
      anchors, "doc_id", corpus, "doc_id", k = 8, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byAnchor = out.groupBy(_._1)
    assert(byAnchor.keySet.size == 10)
    byAnchor.foreach { case (a, rows) =>
      assert(rows.length <= 8 && rows.length >= 7) // rare self-collision only
      assert(rows.forall(_._3 != a), s"anchor $a sampled itself")
    }
    // deterministic across runs
    val again = Shuffling.negativeSample(
      anchors, "doc_id", corpus, "doc_id", k = 8, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSet == again.toSet)
    // different seed draws a different set
    val other = Shuffling.negativeSample(
      anchors, "doc_id", corpus, "doc_id", k = 8, seed = 4L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSet != other.toSet)
    // draws spread across the corpus, not clustered in one region
    val negs = out.map(_._3)
    assert(negs.distinct.length > negs.length / 2)
    assert(negs.count(_ < 250) > 10 && negs.count(_ >= 250) > 10)
  }

  test("rankCorrelation: +1 on identical order, -1 on reversed, ~0 on hash-independent") {
    import spark.implicits._
    val n = 400L
    // y_same preserves x's order; y_rev reverses it; y_hash is
    // order-independent of x
    val base = (0L until n).map(i => (i, i * 3))
      .toDF("id", "x")
      .withColumn("y_same", col("x") + 7L)
      .withColumn("y_rev", lit(n * 3) - col("x"))
      .withColumn("y_hash", Sampling.bucket(col("id"), 99L))
    def rho(y: String): Long =
      Shuffling.rankCorrelation(base, "id", col("x"), col(y))
        .collect().head.getAs[Long]("rho_ppm")
    assert(rho("y_same") === 1000000L)
    // reversed ranks: rho = 1 - 6*sum_d2/(n(n^2-1)) = -1 exactly... up
    // to the integer div truncation of the closed form
    assert(rho("y_rev") <= -999000L, s"reversed rho ${rho("y_rev")}")
    assert(math.abs(rho("y_hash")) < 150000L, s"independent rho ${rho("y_hash")}")
    // partitioning independence
    val a = Shuffling.rankCorrelation(base.repartition(7), "id",
      col("x"), col("y_hash")).collect().head.toSeq
    val b = Shuffling.rankCorrelation(base.repartition(2), "id",
      col("x"), col("y_hash")).collect().head.toSeq
    assert(a === b)
  }

  test("interleaveBySource: unique positions, strict round-robin while sources last") {
    import spark.implicits._
    // 3 sources with 4/4/2 rows: the first 6 positions must cycle
    // a,b,c,a,b,c; after c runs dry, a and b keep their slots
    val df = (1L to 10L).map(i =>
      (i, Seq("a", "b", "c")((i % 10 % 3).toInt) match {
        case "c" if i > 6 => "a" // rebalance: c gets rows 3, 6 only
        case s => s
      })).toDF("id", "src")
    val got = Shuffling.interleaveBySource(df, "id", "src", seed = 5L)
      .orderBy("pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._3).distinct.length === got.length) // unique pos
    // pos mod n_src identifies the source ordinal — round-robin slots
    val slotBySrc = got.map(t => t._2 -> t._3 % 3).distinct
    assert(slotBySrc.toMap.size === 3 && slotBySrc.length === 3)
    // determinism + partition independence
    val again = Shuffling.interleaveBySource(df.repartition(7), "id", "src", 5L)
      .orderBy("pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === again.toSeq)
  }
}
