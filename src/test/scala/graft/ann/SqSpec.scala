package graft.ann

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** SQ8 scalar quantization: sequential-reference equality (codes and
  * IEEE error), zero-scale dimensions, code range, and an asymmetric
  * retrieval floor vs exact L2 on clustered vectors.
  */
class SqSpec extends AnyFunSuite with SparkSpec {

  private val dim = 16

  private def emb(rows: Seq[(Long, Seq[Float])], parts: Int = 3) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, parts),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))

  private def refEncode(rows: Seq[(Long, Seq[Float])])
      : Map[Long, (Seq[Int], Double)] = {
    val scales = (0 until dim).map(d => rows.map(r => math.abs(r._2(d).toDouble)).max)
    rows.map { case (id, v) =>
      val codes = (0 until dim).map { d =>
        if (scales(d) > 0) math.floor(v(d).toDouble / scales(d) * 127.0).toInt
        else 0
      }
      val err = (0 until dim).foldLeft(0.0) { (acc, d) =>
        val dv = codes(d).toDouble * scales(d) / 127.0
        val x = v(d).toDouble - dv
        acc + x * x
      }
      id -> ((codes, err))
    }.toMap
  }

  test("encode matches the sequential reference exactly; zero dims encode 0; codes in [-127, 127]") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 40L).map(i =>
      (i, (0 until dim).map(d =>
        if (d == 3) 0.0f else rnd.nextGaussian().toFloat)))
    val df = emb(rows)
    val scales = Sq.sq8Scales(df, "embedding")
    val got = Sq.sq8Encode(df, "vec_id", "embedding", scales, dim)
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1).toSeq, r.getDouble(2))))
      .toMap
    val want = refEncode(rows)
    assert(got === want)
    assert(got.values.forall(_._1.forall(c => c >= -127 && c <= 127)))
    assert(got.values.forall(_._1(3) == 0), "zero-scale dim must encode 0")
  }

  test("a short or overlong scale census fails loudly") {
    val df = emb((0L until 5L).map(i => (i, Seq.fill(dim)(1.0f))))
    val wrong = Sq.sq8Scales(df, "embedding")
      .filter(col("dim_idx") < dim - 2)
    intercept[IllegalArgumentException] {
      Sq.sq8Encode(df, "vec_id", "embedding", wrong, dim).collect()
    }
  }

  test("sq8TopK: 8-bit asymmetric retrieval recovers the exact L2 top-5 on clustered vectors") {
    val rnd = new scala.util.Random(9)
    val centers = Seq.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0L until 60L).map(i =>
      (i, centers((i % 4).toInt).map(x =>
        x + 0.05f * rnd.nextGaussian().toFloat).toSeq))
    val df = emb(rows)
    val scales = Sq.sq8Scales(df, "embedding")
    val queries = df.filter(col("vec_id") < 6)
    val got = Sq.sq8TopK(queries, df, "vec_id", "embedding", 5, scales, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = rows.filter(_._1 < 6).map { case (qid, qv) =>
      val qd = qv.map(_.toDouble)
      val exact = rows.filter(_._1 != qid).map { case (id, v) =>
        (id, qd.zip(v.map(_.toDouble))
          .foldLeft(0.0) { case (acc, (a, b)) => acc + (a - b) * (a - b) })
      }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
      (got(qid) & exact).size
    }
    assert(hits.sum.toDouble / hits.size >= 4.0,
      s"8-bit recall@5 ${hits.sum.toDouble / hits.size} below floor 4.0")
  }

  test("ivfSq8TopK: probing every cell reproduces the flat SQ8 search; pruning keeps a recall floor") {
    val rnd = new scala.util.Random(13)
    val centers = Seq.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0L until 60L).map(i =>
      (i, centers((i % 4).toInt).map(x =>
        x + 0.05f * rnd.nextGaussian().toFloat).toSeq))
    val df = emb(rows)
    val scales = Sq.sq8Scales(df, "embedding")
    val queries = df.filter(col("vec_id") < 6)
    def collect(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getInt(2)) -> x.getLong(1)).toMap
    // nProbe = nCells: no pruning, must equal the flat decoded search
    val full = collect(Sq.ivfSq8TopK(queries, df, "vec_id", "embedding", 5,
      scales, dim, nCells = 8, nProbe = 8))
    val flat = collect(Sq.sq8TopK(queries, df, "vec_id", "embedding", 5,
      scales, dim))
    assert(full === flat, "full-probe IVF-SQ8 must equal flat SQ8")
    // pruned probing on clustered data keeps most of the top-5
    val pruned = Sq.ivfSq8TopK(queries, df, "vec_id", "embedding", 5,
      scales, dim, nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = flat.toSeq.groupBy(_._1._1).map { case (qid, rs) =>
      (pruned.getOrElse(qid, Set.empty) & rs.map(_._2).toSet).size
    }
    assert(hits.sum.toDouble / hits.size >= 3.0,
      s"pruned recall ${hits.sum.toDouble / hits.size} below floor")
  }
}
