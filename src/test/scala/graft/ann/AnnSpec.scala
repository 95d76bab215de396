package graft.ann

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** ANN internals: bit-exactness of the driver-side literal plane
  * weights vs the md5 expression they replaced (round-2 verdict item
  * 1), quantizer-sample boundedness, small-corpus IVF guards, and
  * recall floors for the approximate paths.
  */
class AnnSpec extends AnyFunSuite with SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"
  private val sf1 = "/root/testdata/sf0.1"

  test("planeWeightValue reproduces the md5(plane:dim) arithmetic exactly") {
    // reference values computed independently (python hashlib)
    assert(Ann.planeWeightValue(0, 1) == 0.013490000000000002)
    assert(Ann.planeWeightValue(0, 2) == 0.17754999999999999)
    assert(Ann.planeWeightValue(11, 64) == -0.23284)
    assert(Ann.planeWeightValue(47, 64) == 0.22699999999999998)
    // range: (-0.5, 0.5)
    val w = Ann.planeWeights(48, 64).flatten
    assert(w.forall(x => x >= -0.5 && x < 0.5))
  }

  test("literal-weight lshSignature is bit-identical to the runtime md5 expression") {
    // the pre-round-3 formulation: md5 evaluated per (plane × dim) per
    // row — kept here as the ground truth the literal matrix must match
    def runtimeSig(vec: Column, planes: Int): Column = {
      val bits = (0 until planes).map { p =>
        def w(i: Column): Column =
          (conv(substring(md5(concat(lit(s"$p:"), i.cast("string"))), 1, 15), 16, 10)
            .cast("long") % lit(100000L)).cast("double") / lit(100000.0) - lit(0.5)
        val proj = aggregate(
          zip_with(vec, sequence(lit(1), size(vec)), (x, i) => x.cast("double") * w(i)),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val diff = emb.select(
      Ann.lshSignature(col("embedding"), 12, 64).as("a"),
      runtimeSig(col("embedding"), 12).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("VecDot expression is bit-identical to the aggregate/zip_with formulation") {
    def hofDot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.limit(5).select(col("embedding").as("b")))
    val diff = pairs.select(
      graft.functions.VecDot.vec_dot(col("a"), col("b")).as("x"),
      hofDot(col("a"), col("b")).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(diff == 0)

    // null semantics: null array -> null; length mismatch -> null
    val rows = Seq(
      Row(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      Row(null, Seq(1.0f, 1.0f)),
      Row(Seq(1.0f, 2.0f), Seq(1.0f, 1.0f, 1.0f)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("a", ArrayType(FloatType), nullable = true),
        StructField("b", ArrayType(FloatType), nullable = true))))
    val out = d.select(graft.functions.VecDot.vec_dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))

    // SQL registration works too
    graft.functions.VecDot.register(spark)
    d.createOrReplaceTempView("vd")
    assert(spark.sql("SELECT vec_dot(a, b) FROM vd").collect()(0).getDouble(0) == 11.0)
  }

  test("lshSignature: wrong-dim vectors raise; null vectors stay null") {
    val rows = Seq(
      Row(1L, Seq(1.0f, 2.0f)),
      Row(2L, null))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = true))))
    // matching dim: computes; null row passes through as null
    val ok = d.select(Ann.lshSignature(col("embedding"), 4, dim = 2).as("sig"))
      .collect()
    assert(!ok(0).isNullAt(0) && ok(1).isNullAt(0))
    // mismatched dim must raise, not silently bucket everything at 0
    val e = intercept[Exception] {
      d.select(Ann.lshSignature(col("embedding"), 4, dim = 64)).collect()
    }
    assert(e.getMessage != null)
  }

  test("lshBandKeys agree with lshSignature bit slices below the 63-plane cap") {
    // same weight family, same plane partition: for planes <= 63 band
    // b's key must equal bits [b*r, (b+1)*r) of the packed signature
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val bands = 8; val r = 6
    val bandFromSig = (0 until bands).map { b =>
      shiftright(col("sig"), b * r).bitwiseAND(lit((1L << r) - 1))
    }
    val diff = emb.select(
      Ann.lshSignature(col("embedding"), bands * r, 64).as("sig"),
      Ann.lshBandKeys(col("embedding"), bands, r, 64).as("keys"))
      .filter(array(bandFromSig: _*) =!= col("keys")).count()
    assert(diff == 0)
  }

  test("lshBandKeys: wrong-dim vectors raise; null vectors yield null key arrays") {
    import org.apache.spark.sql.types._
    val rows = Seq(Row(1L, Seq(1.0f, 2.0f)), Row(2L, null))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = true))))
    val ok = d.select(Ann.lshBandKeys(col("embedding"), 2, 2, dim = 2).as("k"))
      .collect()
    assert(!ok(0).isNullAt(0) && ok(1).isNullAt(0))
    val e = intercept[Exception] {
      d.select(Ann.lshBandKeys(col("embedding"), 2, 2, dim = 64)).collect()
    }
    assert(e.getMessage != null)
  }

  test("cosineNearDupLsh low-threshold config (r=3) recalls >= 0.9 of exact pairs at cos 0.3") {
    // the small-r regime: planes=48, bands=16, r=3 -> expected recall
    // 1-(1-p^3)^16 ~= 0.98 at cos 0.3. A demo regime, not a scale
    // path: 8-bucket band keys pass >= bands/8 of all chance pairs.
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0)
    val exact = Ann.cosineNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.cosineNearDupLsh(emb, "vec_id", "embedding", 0.3,
      planes = 48, bands = 16, maxBucketSize = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture produced no exact near-dup pairs")
    // precision is exact by construction (candidates verified by true cosine)
    assert(approx.subsetOf(exact), s"false positives: ${approx.diff(exact)}")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (${approx.size}/${exact.size})")
  }

  /** The e_cos_neardup_lsh demo corpus: embeddings plus their int8
    * quantize->dequantize twins (cos ~ 0.9999) under id+1000000.
    */
  private def withQuantTwins(base: DataFrame): DataFrame = {
    val twins = Ann.quantizeInt8(base, "vec_id", "embedding")
      .select((col("id") + 1000000L).as("vec_id"),
        transform(col("qvec"),
          x => x.cast("double") / lit(127.0) * col("qscale")).as("embedding"))
    base.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("embedding"))
      .unionByName(twins)
  }

  test("cosineNearDupLsh demo config (r=12, 4096-bucket bands) recalls >= 0.9 twin pairs") {
    // expected recall at cos ~ 0.9999: p = 1 - acos(c)/pi ~ 0.9986,
    // 1-(1-p^12)^16 ~ 1; every vector must pair with its twin
    val union = withQuantTwins(
      spark.read.parquet(s"$sf01/embeddings.parquet")
        .filter(col("vec_id") % 10 === 0))
    val exact = Ann.cosineNearDupPairs(union, "vec_id", "embedding", 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.cosineNearDupLsh(union, "vec_id", "embedding", 0.98,
      planes = 192, bands = 16, maxBucketSize = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 50, s"expected one twin pair per vector, got ${exact.size}")
    assert(approx.subsetOf(exact), s"false positives: ${approx.diff(exact)}")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (${approx.size}/${exact.size})")
  }

  test("wide band keys keep candidate volume ~linear when the corpus doubles") {
    // r=12 band keys admit ~bands/2^12 ~ 0.4% of chance pairs; the
    // round-3 packed-long scheme capped r at 3 (8 buckets), admitting
    // >= bands/8 of ALL pairs — both fractions independent of corpus
    // content, so this pins the 2^-r constant and the growth rate.
    val emb = spark.read.parquet(s"$sf1/embeddings.parquet")
    def candidates(n: Int): Long =
      Ann.cosineLshCandidates(emb.filter(col("vec_id") < n),
        "vec_id", "embedding", planes = 192, bands = 16, dim = 64,
        maxBucketSize = 0).count()
    val c1 = candidates(1000)
    val c2 = candidates(2000)
    def allPairs(n: Long) = n * (n - 1) / 2
    assert(c1.toDouble / allPairs(1000) < 0.02,
      s"candidates $c1 of ${allPairs(1000)} pairs at n=1000")
    assert(c2.toDouble / allPairs(2000) < 0.02,
      s"candidates $c2 of ${allPairs(2000)} pairs at n=2000")
    // chance collisions at most quadruple on doubling; r=3 would put
    // both fractions above 12% and fail the bounds above
    assert(c2 <= c1 * 6 + 100, s"candidate growth $c1 -> $c2 superquadratic")
  }

  test("int8 quantization: bounded range, reconstruction error within half-step, zero-safe") {
    val rows = Seq(
      Row(1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      Row(2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector: qscale 0
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))
    val q = Ann.quantizeInt8(emb, "vec_id", "embedding")
      .withColumn("err", Ann.dequantMaxError(col("v"), col("qvec"), col("qscale")))
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = q(1L).getSeq[Int](3)
    assert(q1 == Seq(64, -127, 32, 0), s"got $q1")
    assert(q(1L).getDouble(2) == 1.0) // qscale = max |x|
    // half-step bound: |err| <= scale/254 plus float noise
    assert(q(1L).getDouble(4) <= 1.0 / 254.0 + 1e-6)
    assert(q(2L).getSeq[Int](3) == Seq(0, 0, 0, 0) && q(2L).getDouble(4) == 0.0)
  }

  test("zero-norm vectors are excluded from every cosine scoring path (NaN-vs-NULL guard)") {
    // cosine against a zero vector is 0/0: Spark scores NaN and ranks
    // it ABOVE any threshold/neighbor (NaN > every double) while SQL
    // engines yield NULL — phantom results that differ per engine.
    // Every scoring path must drop zero-norm rows on both sides.
    val rows = Seq(
      Row(1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      Row(2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      Row(3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
      Row(4L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))
    def ids(df: DataFrame, cols: (String, String)): Set[Long] =
      df.collect().flatMap(r =>
        Seq(r.getAs[Long](cols._1), r.getAs[Long](cols._2))).toSet

    val bf = Ann.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 3)
    assert(!ids(bf, ("query_id", "neighbor_id")).contains(3L))
    assert(bf.collect().forall(r => !r.getDouble(3).isNaN))

    val lsh = Ann.lshTopK(emb, emb, "vec_id", "embedding", k = 3,
      planes = 4, dim = 4)
    assert(!ids(lsh, ("query_id", "neighbor_id")).contains(3L))

    val ivf = Ann.ivfTopKHashCells(emb, emb, "vec_id", "embedding", k = 3,
      nCells = 2, nProbe = 2)
    assert(!ids(ivf, ("query_id", "neighbor_id")).contains(3L))

    val exact = Ann.cosineNearDupPairs(emb, "vec_id", "embedding", 0.0)
    assert(!ids(exact, ("id_a", "id_b")).contains(3L))
    assert(exact.collect().forall(r => !r.getDouble(2).isNaN))

    val banded = Ann.cosineNearDupLsh(emb, "vec_id", "embedding", 0.0,
      planes = 8, bands = 2, dim = 4, maxBucketSize = 0)
    assert(!ids(banded, ("id_a", "id_b")).contains(3L))
  }

  test("knnClassify: majority label wins, vote ties break to the smallest label") {
    // labeled corpus: three tight clusters around three unit axes;
    // labels 0/1 on x, 2 on y, 3 on z
    def v(x: Double, y: Double, z: Double) = Seq(x.toFloat, y.toFloat, z.toFloat)
    val labeledRows = Seq(
      Row(10L, v(1, 0, 0.01), 0), Row(11L, v(1, 0, -0.01), 0),
      Row(12L, v(1, 0.01, 0), 1), Row(13L, v(1, -0.01, 0), 1),
      Row(20L, v(0, 1, 0), 2), Row(21L, v(0.01, 1, 0), 2),
      Row(30L, v(0, 0, 1), 3))
    val queryRows = Seq(
      Row(1L, v(0.99, 0.01, 0), -1), // x-cluster: k=4 -> labels {0,0,1,1}, tie -> 0
      Row(2L, v(0, 0.99, 0.01), -1)) // y-cluster: 2 wins
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false),
      StructField("label", IntegerType, nullable = false)))
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = Ann.knnClassify(df(queryRows), df(labeledRows),
      "vec_id", "embedding", "label", k = 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out(1L) == ((0, 2L)), s"tie must break to smallest label: $out")
    assert(out(2L)._1 == 2)
  }

  test("classifyFromNeighbors composes with the approximate LSH feed (the scale path)") {
    // two well-separated clusters in 8-dim space; LSH top-k feeds the
    // vote instead of brute force — the documented corpus-scale swap
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false),
      StructField("label", IntegerType, nullable = false)))
    def axis(a: Int, jitter: Float) =
      (0 until 8).map(i => if (i == a) 1f else if (i == (a + 1) % 8) jitter else 0f)
    val labeled = (0 until 6).map(j =>
      Row(10L + j, axis(0, 0.01f * j), 0)) ++ (0 until 6).map(j =>
      Row(20L + j, axis(4, 0.01f * j), 1))
    val queries = Seq(Row(1L, axis(0, 0.03f), -1), Row(2L, axis(4, 0.03f), -1))
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val neighbors = Ann.lshTopK(df(queries), df(labeled),
      "vec_id", "embedding", k = 3, planes = 6, dim = 8)
    val out = Ann.classifyFromNeighbors(neighbors, df(labeled), "vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1), s"LSH-fed vote mislabeled: $out")
  }

  test("bruteForceTopK excludeSelf=false keeps same-id pairs from independent corpora") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    // id 1 exists on both sides with identical vectors — distinct rows
    // in unrelated corpora, not a self-match
    val queries = df(Seq(Row(1L, Seq(1f, 0f))))
    val cands = df(Seq(Row(1L, Seq(1f, 0f)), Row(2L, Seq(0f, 1f))))
    val without = Ann.bruteForceTopK(queries, cands, "vec_id", "embedding", 1)
      .collect().map(_.getLong(1)).toSet
    assert(without == Set(2L), "default drops the colliding id")
    val withSelf = Ann.bruteForceTopK(queries, cands, "vec_id", "embedding", 1,
      excludeSelf = false)
      .collect().map(_.getLong(1)).toSet
    assert(withSelf == Set(1L), "excludeSelf=false must rank the colliding id")
  }

  test("mutualPairs keeps only reciprocal edges — the hub edge dies") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    // two tight pairs (1, 2) and (3, 4): both reciprocal at k=1.
    // The asymmetric edges (e.g. 2→3 appears in nobody's mutual set
    // because 3's best is 4) must vanish
    val emb = df(Seq(
      Row(1L, Seq(1f, 0f, 0f)), Row(2L, Seq(0.99f, 0.1f, 0f)),
      Row(3L, Seq(0.6f, 0.75f, 0f)), Row(4L, Seq(0f, 1f, 0.4f))))
    val topk = Ann.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1)
    val got = Ann.mutualPairs(topk).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L)),
      s"mutual set wrong at k=1: $got")
    // a hand-built ASYMMETRIC top-k frame: 1→2 without 2→1 must die,
    // and the reciprocal (3, 4) pair survives regardless of which
    // direction each row was emitted in
    import spark.implicits._
    val asym = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("query_id", "neighbor_id")
    val got2 = Ann.mutualPairs(asym).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == Set((3L, 4L)), s"asymmetric edge survived: $got2")
  }

  test("quantizerSample is bounded and independent of input partitioning") {
    val rows = (0 until 500).map(i => Row(i.toLong, Seq.fill(8)(i.toFloat)))
    def emb(parts: Int): DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))
    val a = Ann.quantizerSample(emb(2), "vec_id", "embedding", 50, 42L)
      .collect().map(_.getLong(0)).toSeq
    val b = Ann.quantizerSample(emb(13), "vec_id", "embedding", 50, 42L)
      .collect().map(_.getLong(0)).toSeq
    assert(a.length == 50, s"fit input not bounded: ${a.length} rows")
    assert(a == b, "sample depends on input partitioning")
  }

  test("ivfPqTopK with every cell probed equals plain pqTopK (pruning is the only delta)") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(col("vec_id") % 3 === 0)
    val queries = emb.filter(col("vec_id") % 300 === 0)
    val full = Ann.ivfPqTopK(queries, emb, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pq = Ann.pqTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == pq)
    // pruned probes return a subset of each query's PQ candidates,
    // ranked consistently: rank 1 agrees whenever the top candidate's
    // cell was probed — and result sets stay non-empty
    val pruned = Ann.ivfPqTopK(queries, emb, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pruned.nonEmpty)
    assert(pruned.map(_._1).toSet == queries.collect().map(_.getLong(0)).toSet)
  }

  test("ivfTopKHashCells: corpus smaller than nProbe still probes all cells") {
    // 3 vectors, nCells=16, nProbe=4 > |corpus|: the clamped slice must
    // keep all available cells (a raw negative-start slice would return
    // an empty probe list -> zero results)
    val rows = Seq(
      Row(1L, Seq(1.0f, 0.0f, 0.0f)),
      Row(2L, Seq(0.9f, 0.1f, 0.0f)),
      Row(3L, Seq(0.0f, 0.0f, 1.0f)))
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))
    val out = Ann.ivfTopKHashCells(emb, emb, "vec_id", "embedding",
      k = 2, nCells = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Ann.bruteForceTopK(emb, emb, "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every cell probed -> candidate set is complete -> equals brute force
    assert(out == exact, s"got $out, want $exact")
  }

  test("hash-cell IVF and k-means IVF both hit recall floors on clustered vectors") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val centers = Seq.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0 until 80).map { i =>
      val c = centers(i % 4)
      Row(i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))
    val queries = emb.filter(col("vec_id") < 4)
    val exact = Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val hashCells = Ann.ivfTopKHashCells(queries, emb, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hcRecall = exact.intersect(hashCells).size.toDouble / exact.size
    assert(hcRecall >= 0.6, s"hash-cell IVF recall $hcRecall too low")

    val kmeans = Ann.ivfTopK(queries, emb, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val kmRecall = exact.intersect(kmeans).size.toDouble / exact.size
    assert(kmRecall >= 0.8, s"k-means IVF recall $kmRecall too low")
  }

  test("cosineNearDupPairs raises above maxRows and is unchanged below it") {
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0) // 50 rows
    // over the bound: the plan itself raises inside the executors —
    // the quadratic compare never launches unguarded
    val e = intercept[Exception] {
      Ann.cosineNearDupPairs(emb, "vec_id", "embedding", 0.3, maxRows = 10)
        .collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("maxRows") ||
        Option(e.getCause).exists(_.getMessage.contains("maxRows"))),
      s"guard raised the wrong error: ${e.getMessage}")
    // under the bound: identical pairs to an effectively-unbounded run
    val bounded = Ann.cosineNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unbounded = Ann.cosineNearDupPairs(emb, "vec_id", "embedding", 0.3,
      maxRows = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded == unbounded && bounded.nonEmpty)
  }

  test("multi-probe LSH recall is monotone in the probe dial") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 20 === 0)
    def recall(mp: Int) = Ann.annRecall(
      Ann.lshTopK(q, emb, "vec_id", "embedding", k = 10, multiProbe = mp),
      q, emb, "vec_id", "embedding", n = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r1.keySet == r2.keySet)
    // level-2 probes reach a strict superset of buckets, so per-query
    // recall can only grow
    for ((qid, h1) <- r1)
      assert(r2(qid) >= h1, s"query $qid: mp2 ${r2(qid)} < mp1 $h1")
    assert(r2.values.sum > r1.values.sum,
      "2-bit probes found nothing extra on the whole query set — dial inert")
  }

  test("lloydAssignCounts is partitioning-independent and covers the corpus") {
    // the whole point of the id-ordered sequential fold: centroid
    // means (doubles) must not depend on how the sample is split, or
    // the assignment counts drift between runs and engines
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def counts(df: org.apache.spark.sql.DataFrame) =
      Ann.lloydAssignCounts(df, "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val a = counts(emb)
    val b = counts(emb.repartition(13))
    assert(a == b, s"partitioning changed the quantizer: $a vs $b")
    assert(a.map(_._2).sum == emb.count(), "every corpus row assigns to a cell")
    assert(a.size > 1, "refinement collapsed to a single cell")
  }

  test("semDedupPruned prunes planted twins back to their min-id sources, survivors untouched") {
    import org.apache.spark.sql.functions.expr
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planted = Ann.plantQueries(emb.filter(col("vec_id") % 5 === 0),
      "vec_id", "embedding", idOffset = 1000000L, delta = 0.01)
    val corpus = emb
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
      .unionByName(planted)
    val pruned = Ann.semDedupPruned(corpus, "vec_id", "embedding",
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // at 0.9 the synthetic corpus has no organic pairs (floor ~0.5),
    // so every pruned row must be a planted twin whose keeper is its
    // own source — and no source (the min id of its pair) ever prunes
    assert(pruned.nonEmpty, "no twin pruned — fixture inert")
    assert(pruned.forall { case (id, keeper, _) =>
      id >= 1000000L && keeper == id - 1000000L },
      s"non-twin pruned or wrong keeper: ${pruned.filterNot { case (id, k, _) =>
        id >= 1000000L && k == id - 1000000L }.take(3).toList}")
    assert(pruned.forall(_._3 == 1L), "a twin found a second >=0.9 partner")
    // twins prune only when they share their source's cell — the
    // quantizer is trained on the union, so demand a strong majority
    val nPlanted = planted.count()
    assert(pruned.length * 10 >= nPlanted * 8,
      s"only ${pruned.length} of $nPlanted twins pruned — cells split the pairs")
  }

  test("semDedupPruned hot-cell guard: a degenerate cell is skipped, cold cells still prune") {
    import spark.implicits._
    // deterministic by construction: identical vectors ALWAYS share
    // an argmax cell (no tie-break or training idiosyncrasy can split
    // them), so the trio's cell has >= 3 members and the pair's
    // exactly 2 — no other rows exist to contaminate either
    def axis(i: Int): Seq[Double] =
      Seq.tabulate(64)(d => if (d == i) 1.0 else 0.0)
    val corpus = Seq(
      (10L, axis(0)), (11L, axis(0)), (12L, axis(0)), // degenerate mass
      (20L, axis(9)), (21L, axis(9)))                 // a healthy dup pair
      .toDF("vec_id", "embedding")
    def prunedSet(maxCellSize: Int) =
      Ann.semDedupPruned(corpus, "vec_id", "embedding", threshold = 0.9,
        nCells = 4, maxCellSize = maxCellSize)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // unguarded: both clusters prune to their min id
    assert(prunedSet(Int.MaxValue) == Set((11L, 10L), (12L, 10L), (21L, 20L)),
      "unguarded baseline drifted — fixture no longer plants both clusters")
    // guarded at 2: the 3-member cell is blocklisted (its docs SURVIVE
    // unexamined — the conservative failure), the 2-member cell still
    // prunes
    assert(prunedSet(2) == Set((21L, 20L)),
      "hot-cell guard inert or over-blocking")
  }

  test("semDedupPairsAgainstStore hot-cell guard blocks the degenerate store cell on both sides") {
    import spark.implicits._
    def axis(i: Int): Seq[Double] =
      Seq.tabulate(64)(d => if (d == i) 1.0 else 0.0)
    val corpus = Seq(
      (10L, axis(0)), (11L, axis(0)), (12L, axis(0)),
      (20L, axis(9)), (21L, axis(9)))
      .toDF("vec_id", "embedding")
    val cents = Ann.lloydCentroids(corpus, "vec_id", "embedding", nCells = 4)
      .localCheckpoint(true)
    val store = Ann.lloydAssigned(corpus, "vec_id", "embedding", cents)
    // arrivals: one twin per direction (perturbed off-axis so cosine
    // to its sources is ~0.99995, argmax cell unchanged)
    val twins = Seq(
      (1000010L, axis(0).updated(1, 0.01)),
      (1000020L, axis(9).updated(1, 0.01)))
      .toDF("vec_id", "embedding")
    val arrivals = Ann.lloydAssigned(twins, "vec_id", "embedding", cents)
    def pairs(maxCellSize: Int) =
      Ann.semDedupPairsAgainstStore(arrivals, store, threshold = 0.9,
        maxCellSize = maxCellSize)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Int.MaxValue) == Set(
      (1000010L, 10L), (1000010L, 11L), (1000010L, 12L),
      (1000020L, 20L), (1000020L, 21L)),
      "unguarded baseline drifted — fixture no longer reaches both cells")
    // guarded: the trio cell is censused hot on the STORE side and
    // anti-joined on BOTH sides — the axis-0 arrival emits NO verdict
    // (passes as novel), the healthy cell still matches
    assert(pairs(2) == Set((1000020L, 20L), (1000020L, 21L)),
      "store-side hot-cell guard inert or over-blocking")
  }

  test("lloydCellSkew reads the planted degenerate cell off the census") {
    import spark.implicits._
    def axis(i: Int): Seq[Double] =
      Seq.tabulate(64)(d => if (d == i) 1.0 else 0.0)
    val corpus = Seq(
      (10L, axis(0)), (11L, axis(0)), (12L, axis(0)),
      (20L, axis(9)), (21L, axis(9)))
      .toDF("vec_id", "embedding")
    val row = Ann.lloydCellSkew(corpus, "vec_id", "embedding", nCells = 4)
      .collect().head
    assert(row.getLong(0) == 2L, s"n_cells_used: $row")       // trio + pair
    assert(row.getLong(1) == 5L, s"n_rows: $row")
    assert(row.getLong(2) == 3L, s"max_cell_n: $row")
    assert(row.getLong(3) == 600000L, s"max_share_ppm: $row") // floor(3e6/5+.5)
    assert(row.getLong(4) == 250000L, s"ideal_share_ppm: $row") // 1e6/4
    // 600000 > 4 x 250000 is false, but > ideal by 2.4x — the readout
    // itself is the assertion; the threshold rule lives in the
    // scaladoc. top_cells: largest first, cell ids are data-dependent
    // init ids
    assert(row.getString(5).matches("""\d+:3,\d+:2"""),
      s"top_cells malformed: ${row.getString(5)}")
  }

  test("planted cohort: brute force recovers every source at rank 1; LSH is a subset") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val where = col("vec_id") % 20 === 0
    def recover(topK: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame) =
      Ann.plantedRecovery(emb, "vec_id", "embedding", where,
        idOffset = 1000000L, delta = 0.01)(topK)
        .collect().map(r => (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) -1 else r.getInt(2))).toList
    // exact search: the planted twin (cosine ≈ 0.997) must beat every
    // natural pair, i.e. found=1 at rank 1 for ALL queries — this pins
    // that the cohort really is planted closer than the corpus floor
    val brute = recover((q, c) =>
      Ann.bruteForceTopK(q, c, "vec_id", "embedding", k = 10))
    assert(brute.nonEmpty)
    assert(brute.forall { case (_, f, r) => f == 1 && r == 1 },
      s"brute force missed a planted source or ranked it below 1: $brute")
    // the approximate index can only recover a subset of what exact
    // search sees (and at the gated dial it recovers all of them —
    // e_ann_lsh_planted pins the exact counts per sf)
    val lsh = recover((q, c) =>
      Ann.lshTopK(q, c, "vec_id", "embedding", k = 10, multiProbe = 2))
    assert(lsh.map(_._1) == brute.map(_._1))
    assert(lsh.map(_._2).sum <= brute.map(_._2).sum)
  }

  test("semanticContamination census drops corpus-hot cells, keeps the rest") {
    import spark.implicits._
    // corpus: 30 IDENTICAL vectors (every band cell they occupy holds
    // all 30 — hot under any maxBucketSize < 30) plus one distinct
    // vector; eval: copies of both. With the census off both flag;
    // with maxBucketSize=5 the identical block's cells are censored
    // so only the distinct vector survives the scan.
    def vec(seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextDouble() - 0.5)
    }
    val hot = (0 until 30).map(i => (i.toLong, vec(7)))
    val lone = Seq((100L, vec(11)))
    val corpus = (hot ++ lone).toDF("id", "v")
    val evalSet = Seq((900L, vec(7)), (901L, vec(11))).toDF("id", "v")
    def flagged(maxBucket: Int) = Ann.semanticContamination(
      corpus, evalSet, "id", "v", threshold = 0.999,
      maxBucketSize = maxBucket)
      .select("id").as[Long].collect().toSet
    val open = flagged(0)
    assert(open == (0L until 30L).toSet + 100L,
      s"census-off scan missed planted duplicates: $open")
    val censored = flagged(5)
    assert(censored == Set(100L),
      s"maxBucketSize=5 should censor the 30-way hot block: $censored")
  }

  test("mrlTruncate: prefix slice, exact sequential norm, unit output, zero-safe") {
    val rows = Seq(
      Row(1L, Seq(3.0f, 4.0f, 100.0f, -7.0f)), // norm over first 2 = 5
      Row(2L, Seq(0.0f, 0.0f, 9.0f, 9.0f)),    // zero prefix -> zeros
      Row(3L, Seq(-1.5f, 2.5f, 0.5f, 1.0f)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))
    val out = graft.ann.Ann.mrlTruncate(d, "vec_id", "embedding", dims = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Double](2)))).toMap
    // exact left-to-right fold on doubles, like the operator documents
    def ref(v: Seq[Float]): (Double, Seq[Double]) = {
      val h = v.take(2).map(_.toDouble)
      val n = math.sqrt(h.foldLeft(0.0)((a, x) => a + x * x))
      (n, if (n > 0) h.map(_ / n) else h.map(_ => 0.0))
    }
    for ((id, v) <- Seq(1L -> rows(0), 2L -> rows(1), 3L -> rows(2))) {
      val (wn, wv) = ref(v.getSeq[Float](1))
      assert(out(id)._1 === wn)
      assert(out(id)._2 === wv)
    }
    assert(out(1L)._1 === 5.0)
    assert(out(2L)._2 === Seq(0.0, 0.0))
    // renormalized output is unit length (up to fold rounding)
    val n1 = out(1L)._2.foldLeft(0.0)((a, x) => a + x * x)
    assert(math.abs(n1 - 1.0) < 1e-12)
    intercept[IllegalArgumentException] {
      graft.ann.Ann.mrlTruncate(d, "vec_id", "embedding", dims = 0)
    }
  }
}
