package graft.ann

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Residual quantization: sequential-reference exactness (codes AND
  * the IEEE-exact reconstruction error), partition independence,
  * clustered-data error reduction over stage 1, and the
  * narrow-codebook path.
  */
class RvqSpec extends AnyFunSuite with SparkSpec {

  private val dim = 16

  private def emb(rows: Seq[(Long, Seq[Float])], parts: Int = 3) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, parts),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))

  private def clustered(n: Int, nClusters: Int, noise: Float = 0.1f) = {
    val rnd = new scala.util.Random(11)
    val centers =
      Seq.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => x + noise * rnd.nextGaussian().toFloat).toSeq)
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent sequential reference: same sampling rule, same
    * greedy per-stage argmin, same fold order as [[Ann.l2sq]].
    */
  private def refEncode(
      rows: Seq[(Long, Seq[Float])], k: Int, seed: Long = 42L,
  ): Map[Long, (Int, Int, Double, Double)] = {
    val vs = rows.map { case (id, v) => id -> v.map(_.toDouble) }
    def sample(salt: String): Seq[Seq[Double]] =
      vs.sortBy { case (id, _) => (md5hex(s"$seed:$salt:$id"), id) }
        .take(k).map(_._2)
    def argmin(
        v: Seq[Double], cb: Seq[(Int, Seq[Double])],
    ): (Int, Seq[Double], Double) = {
      val scored = cb.map { case (c, cent) =>
        val res = v.zip(cent).map { case (a, b) => a - b }
        val d = res.foldLeft(0.0)((acc, x) => acc + x * x)
        (d, c, res)
      }
      val (d, c, res) = scored.minBy(t => (t._1, t._2))
      (c, res, d)
    }
    val cb1 = sample("r1").zipWithIndex.map { case (v, c) => c -> v }
    val cb2 = sample("r2").map(v => argmin(v, cb1)._2)
      .zipWithIndex.map { case (r, c) => c -> r }
    vs.map { case (id, v) =>
      val (c1, r1, e1) = argmin(v, cb1)
      val (c2, _, e2) = argmin(r1, cb2)
      id -> ((c1, c2, e2, e1))
    }.toMap
  }

  private def run(
      rows: Seq[(Long, Seq[Float])], k: Int, parts: Int = 3,
  ): Map[Long, (Int, Int, Double)] = {
    val df = emb(rows, parts)
    Rvq.rvqEncodeSeedDrawn(df, df, "vec_id", "embedding", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
  }

  test("matches the sequential reference exactly, incl. the IEEE error; partition-independent") {
    val rows = clustered(50, 5)
    val want = refEncode(rows, k = 8)
      .map { case (id, (c1, c2, e2, _)) => id -> ((c1, c2, e2)) }
    assert(run(rows, k = 8) === want)
    assert(run(rows, k = 8, parts = 7) === want)
  }

  test("stage 2 reduces mean reconstruction error on clustered vectors") {
    val rows = clustered(80, 4)
    val ref = refEncode(rows, k = 12)
    val meanE1 = ref.values.map(_._4).sum / ref.size
    val meanE2 = ref.values.map(_._3).sum / ref.size
    val got = run(rows, k = 12)
    val gotMeanE2 = got.values.map(_._3).sum / got.size
    assert(gotMeanE2 === meanE2)
    assert(meanE2 < meanE1 * 0.9,
      s"stage 2 did not reduce error: e1=$meanE1 e2=$meanE2")
  }

  test("identical vectors share codes; codebook seeds encode to zero stage-1 residual") {
    val base = clustered(30, 3)
    val rows = base ++ Seq((1000L, base.head._2), (1001L, base.head._2))
    val got = run(rows, k = 6)
    assert(got(1000L) === got(1001L))
    assert(got(1000L)._1 === got(base.head._1)._1)
  }

  test("rvqTopK: ADC decomposition is near-exact and ranking beats chance on clustered vectors") {
    val rows = clustered(60, 4, noise = 0.05f)
    val df = emb(rows)
    val got = Rvq.rvqTopK(df, df, "vec_id", "embedding", n = 5, k = 12)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // per-pair identity: adc == the decomposition recomputed from the
    // reference codebooks (same fold orders -> exact), and within
    // 1e-9 relative of the DIRECT ||q - a - b||^2 (algebraic identity)
    val vs = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val ref = refEncode(rows, k = 12)
    def sample(salt: String): Seq[Seq[Double]] =
      rows.map { case (id, v) => id -> v.map(_.toDouble) }
        .sortBy { case (id, _) => (md5hex(s"42:$salt:$id"), id) }
        .take(12).map(_._2)
    val cb1 = sample("r1").zipWithIndex.map { case (v, c) => c -> v }
    val cb2raw = sample("r2")
    def argminRes(v: Seq[Double], cb: Seq[(Int, Seq[Double])]): Seq[Double] = {
      val scored = cb.map { case (c, cent) =>
        val res = v.zip(cent).map { case (a, b) => a - b }
        (res.foldLeft(0.0)((acc, x) => acc + x * x), c, res)
      }
      scored.minBy(t => (t._1, t._2))._3
    }
    val cb2 = cb2raw.map(v => argminRes(v, cb1)).zipWithIndex
      .map { case (r, c) => c -> r }
    for ((qid, nid, _, adc) <- got.take(40)) {
      val q = vs(qid)
      val (c1, c2, _, _) = ref(nid)
      val a = cb1(c1)._2
      val b = cb2(c2)._2
      val t1 = q.zip(a).map { case (x, y) => x - y }
        .foldLeft(0.0)((acc, x) => acc + x * x)
      val t2 = q.zip(b).map { case (x, y) => y * y - 2.0 * x * y }
        .foldLeft(0.0)(_ + _)
      val x = a.zip(b).map { case (p, r) => 2.0 * p * r }
        .foldLeft(0.0)(_ + _)
      assert(adc === (t1 + t2) + x, s"ADC mismatch for ($qid, $nid)")
      val recon = q.indices.map(i => q(i) - a(i) - b(i))
      val direct = recon.foldLeft(0.0)((acc, d) => acc + d * d)
      assert(math.abs(adc - direct) <= 1e-9 * math.max(1.0, direct),
        s"decomposition drifted from the direct distance: $adc vs $direct")
    }
    // quality: top-1 neighbor shares the query's planted cluster for
    // most queries (4 tight clusters, 15 members each)
    val top1 = got.filter(_._3 == 1)
    val sameCluster = top1.count { case (q, nb, _, _) =>
      (q % 4) == (nb % 4) }
    assert(sameCluster * 10 >= top1.length * 8,
      s"only $sameCluster/${top1.length} top-1 hits in-cluster")
  }

  test("map-only encode is bit-identical to the shuffled encode; plan has no exchange") {
    val rows = clustered(50, 5)
    val df = emb(rows)
    val (cb1, cb2) = Rvq.seedDrawnCodebooks(df, "vec_id", "embedding", k = 8)
    val viaAgg = Rvq.rvqEncode(df, "vec_id", "embedding", cb1, cb2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
    val mapOnly = Rvq.rvqEncodeMapOnly(df, "vec_id", "embedding", cb1, cb2)
    val got = mapOnly.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
    assert(got === viaAgg)
    val plan = mapOnly.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"map-only encode gained a shuffle:\n$plan")
  }

  test("corpus narrower than k yields dense codes and still matches the reference") {
    val rows = clustered(5, 2)
    val got = run(rows, k = 16)
    val want = refEncode(rows, k = 16)
      .map { case (id, (c1, c2, e2, _)) => id -> ((c1, c2, e2)) }
    assert(got === want)
    assert(got.values.forall(t => t._1 >= 0 && t._1 < 5 && t._2 >= 0 && t._2 < 5))
  }

  test("rvqCodebooksRefined: error does not regress and recall@5 >= seed-drawn on clustered data") {
    val rows = clustered(120, 6)
    val df = emb(rows)
    val (rcb1, rcb2) = Rvq.rvqCodebooksRefined(df, "vec_id", "embedding",
      k = 8, iters = 2, maxTrainRows = 120)
    val (scb1, scb2) = Rvq.seedDrawnCodebooks(df, "vec_id", "embedding", k = 8)
    // Lloyd refinement must not LOSE reconstruction quality vs the
    // raw draw on data with clear cluster structure
    def meanErr(cb1: org.apache.spark.sql.DataFrame,
        cb2: org.apache.spark.sql.DataFrame): Double =
      Rvq.rvqEncode(df, "vec_id", "embedding", cb1, cb2)
        .agg(org.apache.spark.sql.functions.avg("err2")).head.getDouble(0)
    val (re, se) = (meanErr(rcb1, rcb2), meanErr(scb1, scb2))
    assert(re <= se, s"refined mean err2 $re above seed-drawn $se")
    // the pinned recall floor: refined ADC recall@5 vs exact L2 must
    // not drop below the seed-drawn number on the same slice
    val queries = df.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val exactTop = rows.filter(_._1 < 8).map { case (qid, qv) =>
      val qd = qv.map(_.toDouble)
      qid -> rows.filter(_._1 != qid).map { case (id, v) =>
        val d = qd.zip(v.map(_.toDouble))
          .foldLeft(0.0) { case (acc, (a, b)) => acc + (a - b) * (a - b) }
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }.toMap
    def meanHits(cb1: org.apache.spark.sql.DataFrame,
        cb2: org.apache.spark.sql.DataFrame): Double = {
      val approx = Rvq.rvqTopKWithCodebooks(queries, df, "vec_id",
        "embedding", 5, cb1, cb2).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(approx.keySet === exactTop.keySet)
      exactTop.map { case (qid, ex) => (approx(qid) & ex).size }
        .sum.toDouble / exactTop.size
    }
    val (rh, sh) = (meanHits(rcb1, rcb2), meanHits(scb1, scb2))
    assert(rh >= sh, s"refined recall@5 $rh below seed-drawn $sh")
    assert(rh > 1.0, s"refined recall@5 $rh no better than noise")
  }

  test("ivfRvqTopK: full-probe run is identical to the flat ADC retrieval; pruning only shrinks the result") {
    import org.apache.spark.sql.functions.col
    val rows = clustered(100, 5)
    val df = emb(rows)
    val queries = df.filter(col("vec_id") < 6)
    val (cb1, cb2) = Rvq.rvqCodebooksRefined(df, "vec_id", "embedding",
      k = 8, iters = 2, maxTrainRows = 100)
    def key(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val flat = key(Rvq.rvqTopKWithCodebooks(queries, df, "vec_id",
      "embedding", 5, cb1, cb2))
    // nProbe >= nCells: the cell join prunes nothing, so the composed
    // index must reproduce the flat ADC ranking EXACTLY (rank, adc)
    val full = key(Rvq.ivfRvqTopK(queries, df, "vec_id", "embedding", 5,
      cb1, cb2, nCells = 8, nProbe = 8))
    assert(full === flat, "full-probe IVF-RVQ diverged from flat ADC")
    // pruned probes: well-formed per query, and every returned adc
    // must equal the flat ADC of the same pair (pruning narrows the
    // candidate set, never changes a surviving pair's score)
    val pruned = key(Rvq.ivfRvqTopK(queries, df, "vec_id", "embedding", 5,
      cb1, cb2, nCells = 8, nProbe = 2))
    assert(pruned.nonEmpty)
    assert(pruned.forall { case (_, _, rank, _) => rank >= 1 && rank <= 5 })
    val flatAdc = key(Rvq.rvqTopKWithCodebooks(queries, df, "vec_id",
      "embedding", 100, cb1, cb2))
      .map(t => (t._1, t._2) -> t._4).toMap
    assert(pruned.forall { case (q, nb, _, adc) => flatAdc((q, nb)) == adc },
      "a pruned pair's ADC diverged from the flat scoring")
  }
}
