package graft.ann

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Matryoshka funnel retrieval: unpruned-funnel equivalence with the
  * exact verifier, prefix-zero-norm exclusion, and a pruned-funnel
  * recall floor on clustered vectors.
  */
class MatryoshkaSpec extends AnyFunSuite with SparkSpec {

  private val dim = 16
  private val coarseDim = 4

  private def emb(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, 3),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))

  private def clustered(n: Int, nClusters: Int, noise: Float = 0.08f) = {
    val rnd = new scala.util.Random(23)
    val centers =
      Seq.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => x + noise * rnd.nextGaussian().toFloat).toSeq)
    }
  }

  test("with coarseN >= corpus the funnel equals the exact top-k") {
    val rows = clustered(30, 3)
    val df = emb(rows)
    val q = df.filter(col("vec_id") < 5)
    val funnel = Matryoshka.mrlTopK(q, df, "vec_id", "embedding",
      n = 5, coarseDim = coarseDim, coarseN = 40)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val exact = Ann.bruteForceTopK(q, df, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(funnel === exact,
      "an unpruned funnel must reproduce the exact verifier")
  }

  test("a zero prefix excludes the row from both sides even when the full vector is nonzero") {
    val rows = clustered(12, 2) :+
      (100L, Seq.fill(coarseDim)(0.0f) ++ Seq.fill(dim - coarseDim)(1.0f))
    val df = emb(rows)
    val got = Matryoshka.mrlTopK(df, df, "vec_id", "embedding",
      n = 3, coarseDim = coarseDim, coarseN = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!got.exists(_._1 == 100L), "zero-prefix query must be excluded")
    assert(!got.exists(_._2 == 100L), "zero-prefix candidate must be excluded")
  }

  test("the LSH-coarse funnel keeps a recall floor and ranks by FULL-width cosine") {
    val rows = clustered(80, 4)
    val df = emb(rows)
    val q = df.filter(col("vec_id") < 6)
    val got = Matryoshka.mrlLshTopK(q, df, "vec_id", "embedding",
      n = 5, coarseDim = 8, coarseN = 15, planes = 6, multiProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3)))
    assert(got.nonEmpty)
    // ranks follow the full-dim cosine recomputed independently
    val vs = rows.toMap
    for ((qid, nid, _, score) <- got) {
      val qd = vs(qid).map(_.toDouble); val nd = vs(nid).map(_.toDouble)
      val dot = qd.zip(nd).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
      val cos = dot / (math.sqrt(qd.map(x => x * x).sum) *
        math.sqrt(nd.map(x => x * x).sum))
      assert(math.abs(cos - score) < 1e-9,
        s"($qid,$nid) score $score is not the full-width cosine $cos")
    }
    val exact = Ann.bruteForceTopK(q, df, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.map { case (qid, ex) =>
      (byQ.getOrElse(qid, Set.empty) & ex).size
    }
    assert(hits.sum.toDouble / hits.size >= 2.0,
      s"lsh funnel recall@5 ${hits.sum.toDouble / hits.size} below floor")
  }

  test("a narrow funnel keeps a recall floor on clustered vectors") {
    val rows = clustered(80, 4)
    val df = emb(rows)
    val q = df.filter(col("vec_id") < 6)
    val funnel = Matryoshka.mrlTopK(q, df, "vec_id", "embedding",
      n = 5, coarseDim = coarseDim, coarseN = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Ann.bruteForceTopK(q, df, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.map { case (qid, ex) =>
      (funnel.getOrElse(qid, Set.empty) & ex).size
    }
    assert(hits.sum.toDouble / hits.size >= 3.0,
      s"funnel recall@5 ${hits.sum.toDouble / hits.size} below floor")
  }
}
