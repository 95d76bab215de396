package graft.ann

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Product quantization: codebook shape and determinism, encode
  * bounds/partition-independence, ADC ranking quality vs the exact L2
  * baseline, and the narrow-codebook stride guard.
  */
class PqSpec extends AnyFunSuite with SparkSpec {

  private val dim = 16
  private val m = 4
  private val k = 8

  private def emb(rows: Seq[(Long, Seq[Float])], parts: Int = 2) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, parts),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))

  private def clustered(n: Int, nClusters: Int, noise: Float = 0.05f) = {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => x + noise * rnd.nextGaussian().toFloat).toSeq)
    }
  }

  test("pqCodebooks: m·k rows, d-dim centroids, codes 0..k-1 per subspace") {
    val cb = Ann.pqCodebooks(emb(clustered(40, 4)), "vec_id", "embedding",
      m, k, dim).collect()
    assert(cb.length === m * k)
    assert(cb.forall(_.getSeq[Double](2).length === dim / m))
    val bySub = cb.groupBy(_.getInt(0))
    assert(bySub.keySet === (0 until m).toSet)
    assert(bySub.values.forall(_.map(_.getInt(1)).sorted.toSeq === (0 until k)))
  }

  test("opqPermutation: a bijection that deals the energy ranks round-robin") {
    // dimension j carries energy proportional to j (planted skew)
    val rows = (0L until 30L).map(i =>
      (i, (0 until dim).map(j => (j + 1) * 0.1f * (if (i % 2 == 0) 1 else -1))))
    val df = emb(rows)
    val perm = Ann.opqPermutation(df, "embedding", m, dim)
      .collect().map(r => r.getInt(1) -> r.getInt(0)).toMap // perm_idx -> dim
    assert(perm.keySet === (0 until dim).toSet)
    assert(perm.values.toSet === (0 until dim).toSet, "not a bijection")
    // energy rank r = dim-1-j here (higher j = higher energy), so the
    // top-m dims (dim-1, dim-2, …) must land in m DISTINCT subspaces
    val d = dim / m
    val topSubspaces = (0 until m).map { r =>
      val dimIdx = dim - 1 - r
      perm.collectFirst { case (p, di) if di == dimIdx => p / d }.get
    }
    assert(topSubspaces.toSet.size === m,
      s"top-energy dims share a subspace: $topSubspaces")
    // applying the permutation is the literal reorder
    val permutedHead = df.select(
        Ann.opqPermute("embedding", Ann.opqPermutation(
          df, "embedding", m, dim), dim).as("p"),
        org.apache.spark.sql.functions.col("embedding"))
      .head()
    val src = permutedHead.getSeq[Float](1)
    val inv = perm.map { case (p, di) => p -> di }
    assert(permutedHead.getSeq[Float](0).zipWithIndex.forall {
      case (x, p) => x == src(inv(p)) })
  }

  test("pqEncode: codes bounded, in subspace order, independent of partitioning") {
    val rows = clustered(60, 4)
    def codesOf(parts: Int): Map[Long, Seq[Int]] = {
      val df = emb(rows, parts)
      val cb = Ann.pqCodebooks(df, "vec_id", "embedding", m, k, dim)
      Ann.pqEncode(df, "vec_id", "embedding", cb, m, dim)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    }
    val one = codesOf(1)
    assert(one.size === 60)
    assert(one.values.forall(c => c.length === m && c.forall(x => x >= 0 && x < k)))
    assert(one === codesOf(5), "codes depend on input partitioning")
  }

  test("pqTopK beats chance and hits a recall floor vs exact L2 on clustered vectors") {
    val df = emb(clustered(80, 4))
    val queries = df.filter(col("vec_id") < 4)
    // exact L2 baseline (same tie rule: distance, then id)
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    val c = df.select(col("vec_id").as("neighbor_id"),
      transform(col("embedding"), _.cast("double")).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    val exact = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Ann.l2sq(col("qv"), col("cv")).as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Ann.pqTopK(queries, df, "vec_id", "embedding", 5,
      m = m, k = k, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // PQ recovers the NEIGHBORHOOD, not the within-cluster fine order:
    // tight-cluster members share codes, so their ADCs tie and the id
    // tiebreak reshuffles the exact list. The contract worth pinning is
    // that every returned neighbor is from the query's cluster (i%4),
    // and that ADC still overlaps the exact list well above the ~6%
    // a random top-5 of 80 would get.
    assert(pq.forall { case (q, n) => n % 4 === q % 4 },
      s"PQ returned an out-of-cluster neighbor: $pq")
    val recall = exact.intersect(pq).size.toDouble / exact.size
    assert(recall >= 0.3, s"PQ overlap $recall below floor")
  }

  test("pqCodebooksRefined: seed-drawn shape, canonical code order, recall@10 >= seed-drawn") {
    val df = emb(clustered(120, 6))
    val refined = Ann.pqCodebooksRefined(df, "vec_id", "embedding",
      m, k, dim, maxIter = 8)
    val cb = refined.collect()
    assert(cb.length === m * k)
    assert(cb.forall(_.getSeq[Double](2).length === dim / m))
    // canonical renumbering: codes follow lexicographic centroid order
    import scala.math.Ordering.Implicits.seqOrdering
    cb.groupBy(_.getInt(0)).values.foreach { rows =>
      val byCode = rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq)
      assert(byCode.toSeq === byCode.sorted.toSeq, "codes not in centroid order")
    }
    // Lloyd refinement must not LOSE recall vs the unrefined draw on
    // data with clear cluster structure (it should usually gain)
    val queries = df.filter(col("vec_id") < 8)
    def meanHits(codebooks: org.apache.spark.sql.DataFrame): Double = {
      val r = Ann.pqRecallWithCodebooks(queries, df, "vec_id", "embedding",
        10, codebooks, m, dim).collect()
      assert(r.length === 8)
      r.map(_.getLong(1)).sum.toDouble / r.length
    }
    val seedDrawn = Ann.pqCodebooks(df, "vec_id", "embedding", m, k, dim)
    val refinedHits = meanHits(refined)
    val seedHits = meanHits(seedDrawn)
    assert(refinedHits >= seedHits,
      s"refined recall@10 $refinedHits below seed-drawn $seedHits")
  }

  test("pqCodebooksRefinedDet: shape, partition-independence, composed-IVF recall floor >= seed-drawn") {
    val rows = clustered(120, 6)
    val df = emb(rows)
    def det(parts: Int) =
      Ann.pqCodebooksRefinedDet(emb(rows, parts), "vec_id", "embedding",
        m, k, dim, iters = 2, maxTrainRows = 100)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
        .sortBy(t => (t._1, t._2)).toSeq
    val cb = det(2)
    assert(cb.length === m * k)
    assert(cb.forall(_._3.length === dim / m))
    // deterministic Lloyd: bit-identical centroids at any partitioning
    assert(cb === det(5), "refined centroids depend on input partitioning")
    // the composed production index (coarse cells + refined codes)
    // must not LOSE recall vs the same index on seed-drawn codebooks
    val queries = df.filter(col("vec_id") < 8)
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    val c = df.select(col("vec_id").as("neighbor_id"),
      transform(col("embedding"), _.cast("double")).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    val exact = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Ann.l2sq(col("qv"), col("cv")).as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(codebooks: org.apache.spark.sql.DataFrame): Int =
      Ann.ivfPqTopKWithCodebooks(queries, df, "vec_id", "embedding", 10,
        codebooks, m = m, dim = dim)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .count(exact.contains)
    val refinedHits = hits(Ann.pqCodebooksRefinedDet(df, "vec_id",
      "embedding", m, k, dim, iters = 2, maxTrainRows = 100))
    val seedHits = hits(Ann.pqCodebooks(df, "vec_id", "embedding", m, k, dim))
    assert(refinedHits >= seedHits,
      s"composed refined recall $refinedHits below seed-drawn $seedHits")
  }

  test("pqEncodeErr: errq equals the sum of per-subspace argmin distances, partition-independent") {
    val rows = clustered(40, 4)
    val df = emb(rows)
    val cb = Ann.pqCodebooks(df, "vec_id", "embedding", m, k, dim)
    def errs(parts: Int): Map[Long, Double] =
      Ann.pqEncodeErr(emb(rows, parts), "vec_id", "embedding", cb, m, dim)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val one = errs(1)
    assert(one.size === 40)
    assert(one.values.forall(_ >= 0.0))
    assert(one === errs(5), "errq depends on input partitioning")
    // cross-check one row against a direct reconstruction
    val cbMap = cb.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val codes = Ann.pqEncode(df, "vec_id", "embedding", cb, m, dim)
      .filter(col("id") === 0L).head().getSeq[Int](1)
    val v = rows.find(_._1 == 0L).get._2.map(_.toDouble)
    val d = dim / m
    val want = (0 until m).map { s =>
      val cent = cbMap((s, codes(s)))
      v.slice(s * d, s * d + d).zip(cent).map { case (a, b) =>
        (a - b) * (a - b) }.sum
    }.sum
    assert(math.abs(one(0L) - want) < 1e-9,
      s"errq ${one(0L)} != direct reconstruction $want")
  }

  test("pq_pack/pq_unpack: round-trip over random codes at 4 and 8 bits") {
    import graft.functions.PqCodes.{pq_pack, pq_unpack}
    val rnd = new scala.util.Random(11)
    for (bits <- Seq(4, 8); trial <- 0 until 20) {
      val mm = 1 + rnd.nextInt(16) // odd m exercises the pad nibble
      val codes = Seq.fill(mm)(rnd.nextInt(1 << bits))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(codes)), 1),
        StructType(Seq(StructField("codes",
          ArrayType(IntegerType, containsNull = false), nullable = false))))
      val out = df.select(
        pq_unpack(pq_pack(col("codes"), bits), bits, mm).as("rt"),
        length(pq_pack(col("codes"), bits)).as("len")).head()
      assert(out.getSeq[Int](0) === codes, s"bits=$bits trial=$trial")
      val expectLen = if (bits == 4) (mm + 1) / 2 else mm
      assert(out.getInt(1) === expectLen, s"bits=$bits m=$mm packed length")
    }
  }

  test("pq_pack rejects out-of-range codes; pq_unpack rejects geometry mismatch") {
    import graft.functions.PqCodes.{pq_pack, pq_unpack}
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(3, 16))), 1),
      StructType(Seq(StructField("codes",
        ArrayType(IntegerType, containsNull = false), nullable = false))))
    val overflow = intercept[Exception] {
      df.select(pq_pack(col("codes"), 4)).collect()
    }
    assert(overflow.getMessage.contains("out of range") ||
      overflow.getCause.getMessage.contains("out of range"))
    val mismatch = intercept[Exception] {
      // 2 codes pack to 1 byte at 4 bits; unpacking as m=4 must throw
      df.select(pq_unpack(pq_pack(lit(Array(3, 5)), 4), 4, 4)).collect()
    }
    assert(mismatch.getMessage.contains("does not hold") ||
      mismatch.getCause.getMessage.contains("does not hold"))
  }

  test("pqEncodePacked: nibble-packed binary matches unpacked codes") {
    import graft.functions.PqCodes.pq_unpack
    val df = emb(clustered(40, 4))
    val cb = Ann.pqCodebooks(df, "vec_id", "embedding", m, k, dim)
    val plain = Ann.pqEncode(df, "vec_id", "embedding", cb, m, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val packed = Ann.pqEncodePacked(df, "vec_id", "embedding", cb, m, k, dim)
      .select(col("id"), pq_unpack(col("codes_bin"), 4, m).as("codes"),
        length(col("codes_bin")).as("len"))
      .collect()
    assert(packed.length === plain.size)
    assert(packed.forall(_.getInt(2) === (m + 1) / 2), "k<=16 must nibble-pack")
    assert(packed.map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap === plain)
  }

  test("narrow codebook (corpus < k seeds) strides by the effective k, not the configured one") {
    val tiny = emb(clustered(5, 1), parts = 1) // only 5 seeds for k=8
    val out = Ann.pqTopK(tiny, tiny, "vec_id", "embedding", 2,
      m = m, k = k, dim = dim).collect()
    assert(out.nonEmpty)
    // every ADC must be finite and non-null — a wrong stride reads
    // null (out-of-bounds element_at) or another subspace's entries
    assert(out.forall(r => !r.isNullAt(3) && !r.getDouble(3).isNaN))
    // self-consistency: rank 1 per query is the nearest by ADC
    val ranks = out.groupBy(_.getLong(0)).values
    assert(ranks.forall(_.map(_.getInt(2)).sorted.toSeq === Seq(1, 2)))
  }
}
