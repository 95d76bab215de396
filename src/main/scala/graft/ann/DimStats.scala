package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension embedding QA census — the health check an embedding
  * pipeline runs before trusting a model/version bump: a DEAD
  * dimension (all zeros — often a truncation or masking bug), a
  * stuck dimension (min = max), or a range blow-up (quantization or
  * normalization regressed) each shows up as one anomalous row in a
  * `dim`-keyed census instead of silently degrading every downstream
  * similarity score.
  *
  * Float sums fold in engine-private order, so raw moments can never
  * hash-match; instead each component QUANTIZES exactly:
  * `q = floor(v · 2^20)` — the multiply by a power of two is an
  * exact IEEE operation and `floor` is engine-identical, so `q` is
  * the same BIGINT everywhere and integer sums are
  * order-independent. (Spark's bare double→long cast truncates
  * toward zero while DuckDB's ROUNDS — the explicit floor sidesteps
  * that divergence.)
  *
  * Scale shape: `posexplode` is map-side (rows × dim), the census is
  * a `dim`-keyed aggregate with `dim` cells of state — map-side
  * combine collapses every partition to `dim` rows before the
  * shuffle. Output: `(dim, n, n_zero, sum_q, min_q, max_q)`.
  */
object DimStats {

  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("i", "v")))
      .select((col("i") + 1).as("dim"),
        floor(col("v").cast("double") * 1048576L).cast("long").as("q"),
        when(col("v") === 0.0f, 1L).otherwise(0L).as("z"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("z")).as("n_zero"),
        sum(col("q")).as("sum_q"), min(col("q")).as("min_q"),
        max(col("q")).as("max_q"))

  /** Paired version-drift census — the model-upgrade QA check: join
    * two embedding versions on id, cosine each pair (the same
    * fixed-IEEE sequence as every scoring path, zero-norm rows
    * excluded under the library's NaN rule), and histogram
    * `floor(cos·1000)` — re-embedded corpora should concentrate at
    * bin 999/1000 with a drift tail; a pipeline bug (wrong model,
    * truncation, shuffled ids) shows as mass far below. One id
    * equi-join + a ≤2001-cell census; embeddings move once.
    * Output: `(bin, n_vecs)`.
    */
  def pairedDriftCensus(
      a: DataFrame, b: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val va = a.select(col(idCol).as("id"), col(vecCol).as("va"),
      Ann.norm(col(vecCol)).as("na")).filter(col("na") > 0)
    val vb = b.select(col(idCol).as("id"), col(vecCol).as("vb"),
      Ann.norm(col(vecCol)).as("nb")).filter(col("nb") > 0)
    va.join(vb, Seq("id"))
      .select(floor(
        Ann.dot(col("va"), col("vb")) / (col("na") * col("nb")) * 1000)
        .cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_vecs"))
  }

  /** DuckDB rendering of [[pairedDriftCensus]] where version A is the
    * `whereClause` slice of `embeddings` and version B is the same
    * slice with `bExpr` as its vector expression (the planted-drift
    * device: the gate perturbs B arithmetically so both engines build
    * the identical second version).
    */
  def pairedDriftCensusSql(
      whereClause: String, bExpr: String, dim: Int = 64): String = {
    val nz = (v: String) => s"sqrt(${Ann.dotSql(v, v, dim)}) > 0"
    s"""WITH a AS (SELECT vec_id AS id, embedding AS va FROM embeddings
       |  $whereClause),
       |b AS (SELECT vec_id AS id, $bExpr AS vb FROM embeddings
       |  $whereClause),
       |p AS (SELECT CAST(floor(${Ann.cosineSql("va", "vb", dim)} * 1000)
       |    AS BIGINT) AS bin
       |  FROM a JOIN b USING (id)
       |  WHERE ${nz("va")} AND ${nz("vb")})
       |SELECT bin, count(*) AS n_vecs FROM p
       |GROUP BY bin ORDER BY bin""".stripMargin
  }

  /** DuckDB rendering over `embeddings(vec_id, embedding)` restricted
    * by `whereClause`.
    */
  def dimStatsSql(whereClause: String, dim: Int = 64): String = {
    // mirror the Spark side's isNotNull vector filter: a NULL
    // embedding row would otherwise contribute dim rows of NULL q/z
    // here while the Spark census excludes it entirely
    val where =
      if (whereClause.trim.isEmpty) "WHERE embedding IS NOT NULL"
      else s"$whereClause AND embedding IS NOT NULL"
    s"""WITH x AS (SELECT i,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS q,
       |    CASE WHEN embedding[i] = 0 THEN 1 ELSE 0 END AS z
       |  FROM embeddings, unnest(range(1, ${dim + 1})) AS t(i)
       |  $where)
       |SELECT CAST(i AS INT) AS dim, count(*) AS n,
       |  CAST(SUM(z) AS BIGINT) AS n_zero,
       |  CAST(SUM(q) AS BIGINT) AS sum_q,
       |  MIN(q) AS min_q, MAX(q) AS max_q
       |FROM x GROUP BY i ORDER BY dim""".stripMargin
  }
}
