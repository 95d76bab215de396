package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k via a cross join +
  *     window. Correct baseline; O(|Q|·|C|) comparisons. At 100 TB use
  *     it only for small query sets against broadcastable candidates,
  *     or as the verifier for the approximate path.
  *   - [[lshTopK]] — random-hyperplane LSH: each vector gets a
  *     `planes`-bit signature (sign of dot with deterministic
  *     pseudo-random hyperplanes); candidates share a bucket with the
  *     query, so the cross join shrinks to a per-bucket join keyed by
  *     signature. The plane weights derive from a hash of
  *     (plane, dim) — no RNG state, reproducible across runs and
  *     engines. Probing multiple buckets (bit-flip neighborhoods)
  *     trades recall for cost; here we probe the exact bucket plus all
  *     1-bit flips.
  *
  * Cosine arithmetic is done in doubles with a sequential fold
  * (`aggregate` over `zip_with`), which both Spark and DuckDB evaluate
  * left-to-right — bit-identical results, so the oracle can compare
  * exact values rather than tolerances.
  */
object Ann {

  /** Sequential-fold dot product of two float-array columns, in
    * doubles.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB rendering of [[cosine]] for 1-based list columns A/B of
    * dimension `dim` (list_reduce folds left-to-right like Spark's
    * `aggregate`).
    */
  def cosineSql(a: String, b: String, dim: Int): String = {
    def d(x: String, y: String) =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> " +
        s"CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (acc, v) -> acc + v)"
    s"(${d(a, b)} / (sqrt(${d(a, a)}) * sqrt(${d(b, b)})))"
  }

  /** Exact cosine top-k: for each query vector, the `k` most similar
    * candidates (ties broken by candidate id).
    */
  def bruteForceTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * maps xxhash64 to (-0.5, 0.5). Evaluated inside codegen; the
    * planes are never materialized.
    */
  private def planeWeight(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(100000L)).cast("double") /
      lit(100000.0)) - lit(0.5)

  /** `planes`-bit signature of a vector: bit p = sign of dot(v, plane_p). */
  def lshSignature(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(1), size(vec)),
          (x, i) => x.cast("double") * planeWeight(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: candidates must share the query's bucket or a
    * 1-bit-flip neighbor bucket. Returns the same schema as
    * [[bruteForceTopK]]; recall < 1 by construction.
    */
  def lshTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 12,
  ): DataFrame = {
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshSignature(col(vecCol), planes).as("bucket"))
    // query probes: own bucket + all 1-bit flips
    val probes = (0 until planes).map(p => lit(1L << p)) :+ lit(0L)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshSignature(col(vecCol), planes).as("qsig"))
      .select(col("query_id"), col("qv"),
        explode(array(probes.map(m => col("qsig").bitwiseXOR(m)): _*)).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("score"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions
    * the corpus into `nCells` cells; queries scan only the `nProbe`
    * nearest cells. The index (cell assignment) is computed once and
    * is joinable/bucketable — at 100 TB the corpus is written
    * partitioned by cell id and a query touches nProbe/nCells of the
    * data. Deterministic via fixed seed.
    */
  def ivfTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val train = candidates
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("features", array_to_vector(col("cv")))
      .cache()
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .setMaxIter(8) // coarse quantizer: cell quality saturates fast
      .fit(train)
    val assigned = model.transform(train)
      .select(col("neighbor_id"), col("cv"), col("prediction").as("cell"))

    // rank each query's distance to every centroid, keep nProbe cells
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }.toSeq
    val centroidDf = queries.sparkSession.createDataFrame(centroids)
      .toDF("cell", "centroid")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probes = q.crossJoin(broadcast(centroidDf))
      .withColumn("cdist", -cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))

    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("score"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` among
    * `df` (exact, all-pairs — restrict or LSH-prefilter at scale).
    */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
  ): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
