package graft.ann

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Margin-based mining: genuine cross-side pairs mine above
  * threshold, hub rows are demoted relative to raw cosine, and the
  * per-source argmax ties break to the smaller target id.
  */
class MiningSpec extends AnyFunSuite with SparkSpec {

  private val dim = 8

  private def emb(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, 2),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))

  private def axis(i: Int, scale: Float = 1.0f): Seq[Float] =
    Seq.tabulate(dim)(d => if (d == i) scale else 0.0f)

  test("a genuine pair mines above 1.0; per-source argmax ties to the smaller dst id") {
    // src 1 is a near-exact twin of dst 11 (cos ~1), while every
    // other cross-side cosine is small — margin >> 1 for the pair
    val src = Seq(1L -> axis(0), 2L -> axis(1))
    val dst = Seq(
      11L -> axis(0).updated(1, 0.02f),
      12L -> axis(2), 13L -> axis(3))
    val got = Mining.marginMine(emb(src), emb(dst), "vec_id", "embedding",
      k = 3, threshold = 1.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    assert(got.contains(1L) && got(1L)._1 === 11L,
      s"genuine pair not mined: $got")
    assert(got(1L)._2 > 1.0)
    // duplicate targets -> identical margins; the smaller id wins
    val dst2 = Seq(21L -> axis(0), 22L -> axis(0), 23L -> axis(4))
    val tied = Mining.marginMine(emb(Seq(1L -> axis(0))), emb(dst2),
      "vec_id", "embedding", k = 2, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tied.toSeq === Seq((1L, 21L)), s"tie must keep the smaller id: ${tied.toSeq}")
  }

  test("marginFromRuns is the pluggable core: feeding it the exact runs reproduces marginMine, and an LSH run slots in") {
    val rnd = new scala.util.Random(31)
    val src = (0L until 12L).map(i => i -> Seq.fill(dim)(rnd.nextGaussian().toFloat))
    val dst = (100L until 115L).map(i => i -> Seq.fill(dim)(rnd.nextGaussian().toFloat))
    val (s, d) = (emb(src), emb(dst))
    val viaRuns = Mining.marginFromRuns(
      Ann.bruteForceTopK(s, d, "vec_id", "embedding", 3, excludeSelf = false),
      Ann.bruteForceTopK(d, s, "vec_id", "embedding", 3, excludeSelf = false),
      threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val viaMine = Mining.marginMine(s, d, "vec_id", "embedding", 3,
      threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(viaRuns === viaMine)
    // any family search slots in: the LSH run produces a well-formed
    // mining result (per-source unique, margins finite)
    val lsh = Mining.marginFromRuns(
      Ann.lshTopK(s, d, "vec_id", "embedding", 3, planes = 4, dim = dim),
      Ann.lshTopK(d, s, "vec_id", "embedding", 3, planes = 4, dim = dim),
      threshold = 0.0).collect()
    assert(lsh.map(_.getLong(0)).distinct.length === lsh.length,
      "one mined target per source")
    assert(lsh.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
  }

  test("margin demotes a hub that raw cosine would mine") {
    // dst 30 is a 'hub': its common direction scores ~0.79 against
    // EVERY src, so its own-kNN mean equals its pair score and its
    // margin collapses to ~1.0. dst 31 matches src 1 specifically at
    // ~0.77 (raw cosine still picks the hub) but scores ~0.28
    // against the other srcs, so its own-kNN mean is low and the
    // pair's margin ~1.18 wins
    val src = Seq(
      1L -> Seq.tabulate(dim)(d => if (d == 0) 1.3f else 0.3f),
      2L -> Seq.tabulate(dim)(d => if (d == 1) 1.3f else 0.3f),
      3L -> Seq.tabulate(dim)(d => if (d == 2) 1.3f else 0.3f))
    val dst = Seq(
      30L -> Seq.fill(dim)(0.5f),
      31L -> Seq.tabulate(dim)(d =>
        if (d == 0) 0.75f else if (d == 3) 0.66f else 0.0f))
    // fixture sanity: RAW cosine must pick the hub for src 1
    val raw = Ann.bruteForceTopK(emb(src.take(1)), emb(dst), "vec_id",
      "embedding", 1, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(raw.toSeq === Seq((1L, 30L)),
      s"fixture broken: raw cosine no longer favors the hub: ${raw.toSeq}")
    val margins = Mining.marginMine(emb(src), emb(dst), "vec_id",
      "embedding", k = 2, threshold = 0.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(margins(1L) === 31L,
      s"hub not demoted: src 1 mined ${margins(1L)}")
  }
}
