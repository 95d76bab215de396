package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Matryoshka retrieval (Kusupati et al. 2022, "Matryoshka
  * Representation Learning"): MRL-trained embeddings nest — the
  * first `coarseDim` components are themselves a usable embedding —
  * so retrieval runs funnel-style: a CHEAP coarse pass over the
  * prefix ranks `coarseN` candidates per query at `coarseDim/dim`
  * of the full scoring cost, and only those are re-scored at full
  * width (the published adaptive-retrieval recipe: ~dim/coarseDim×
  * less flops and memory traffic in the stage that touches the
  * whole corpus).
  *
  * Determinism: both stages are fixed IEEE cosine folds with the
  * family tie rule `(score desc, id asc)`; the prefix score indexes
  * the SAME stored array (no re-embedding), so the oracle computes
  * identical doubles and the funnel is hash-gateable end-to-end.
  *
  * 100 TB shape: the rerank is `queries × coarseN` rows — bounded.
  * The coarse pass here is the all-pairs verifier arm (gate
  * contract); at corpus scale the prefix column feeds ANY of the
  * family's index builds (LSH/IVF/PQ/graph) unchanged — nesting
  * means the index stores `coarseDim` floats per row instead of
  * `dim`, which is the whole point. Zero-norm PREFIXES are excluded
  * on both sides (a vector can be nonzero yet zero in its first
  * `coarseDim` components — the cosine NaN hazard applies per
  * stage), mirrored in the oracle.
  */
object Matryoshka {

  /** Funnel top-k: coarse prefix-cosine top-`coarseN`, full-width
    * rerank to top-`n`. Output: `(query_id, neighbor_id, rank,
    * score)` — `score` the FULL-dim cosine.
    */
  def mrlTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      coarseDim: Int, coarseN: Int, excludeSelf: Boolean = true,
  ): DataFrame = {
    require(n >= 1 && coarseN >= n,
      s"need coarseN >= n >= 1, got n=$n coarseN=$coarseN")
    def sides(df: DataFrame, id: String, vec: String, pre: String) =
      df.select(col(idCol).as(id),
        transform(col(vecCol), x => x.cast("double")).as(vec),
        transform(slice(col(vecCol), 1, coarseDim), x => x.cast("double"))
          .as(pre))
        .filter(Ann.norm(col(vec)) > 0 && Ann.norm(col(pre)) > 0)
    val q = sides(queries, "query_id", "qv", "qp")
    val c = sides(candidates, "neighbor_id", "cv", "cp")
    val coarse = q.join(c,
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        Ann.cosine(col("qp"), col("cp")).as("cscore"))
    val funnel = Ann.heapRank(coarse, "cscore", "double", coarseN,
      ascending = false)
      .select(col("query_id"), col("neighbor_id"))
    val rescored = funnel
      .join(c.select(col("neighbor_id"), col("cv")), Seq("neighbor_id"))
      .join(q.select(col("query_id"), col("qv")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Ann.cosine(col("qv"), col("cv")).as("score"))
    Ann.heapRank(rescored, "score", "double", n, ascending = false)
  }

  /** The PRODUCTION funnel: the coarse stage runs [[Ann.lshTopK]]
    * over the PREFIX instead of the all-pairs verifier — nesting
    * means the coarse index hashes/stores `coarseDim` floats per row,
    * so any of the family's index builds slots in unchanged; this
    * composition gates the LSH member end-to-end. Prefix zero-norms
    * drop at the coarse stage (lshTopK's own filter, on the sliced
    * column); the rerank re-scores only the bounded survivor set at
    * full width.
    */
  def mrlLshTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      coarseDim: Int, coarseN: Int,
      planes: Int = 12, multiProbe: Int = 1,
  ): DataFrame = {
    require(n >= 1 && coarseN >= n,
      s"need coarseN >= n >= 1, got n=$n coarseN=$coarseN")
    def prefix(df: DataFrame): DataFrame =
      df.select(col(idCol),
        transform(slice(col(vecCol), 1, coarseDim), x => x.cast("double"))
          .as(vecCol))
    val coarse = Ann.lshTopK(prefix(queries), prefix(candidates),
      idCol, vecCol, coarseN, planes, coarseDim, multiProbe)
      .select(col("query_id"), col("neighbor_id"))
    val c = candidates.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    val rescored = coarse
      .join(c, Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Ann.cosine(col("qv"), col("cv")).as("score"))
    Ann.heapRank(rescored, "score", "double", n, ascending = false)
  }

  /** DuckDB rendering of [[mrlLshTopK]] over `embeddings` (candidates
    * restricted by `whereClause`, queries by `queryWhere` over the
    * same slice, self excluded) — the prefix signature/cosine simply
    * fold indexes `1..coarseDim` of the stored list.
    */
  def mrlLshTopKSql(
      n: Int, coarseDim: Int, coarseN: Int, dim: Int,
      planes: Int, multiProbe: Int,
      whereClause: String, queryWhere: String): String = {
    val sig = Ann.lshSignatureSql("embedding", planes, coarseDim)
    val masks = Ann.probeMasks(planes, multiProbe).mkString(", ")
    val preNz = s"${Ann.dotSql("embedding", "embedding", coarseDim)} > 0"
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
       |  FROM embeddings $whereClause),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, $sig AS bucket
       |  FROM e WHERE $preNz),
       |q0 AS (SELECT vec_id AS query_id, embedding AS qv, $sig AS qsig
       |  FROM e ${if (queryWhere.isEmpty) "WHERE" else s"$queryWhere AND"}
       |    $preNz),
       |q AS (SELECT query_id, qv, xor(qsig, m.mask) AS bucket
       |  FROM q0 CROSS JOIN (SELECT unnest([$masks]) AS mask) m),
       |cscored AS (SELECT DISTINCT query_id, neighbor_id,
       |    ${Ann.cosineSql("qv", "cv", coarseDim)} AS cscore
       |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
       |coarse AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cscore DESC, neighbor_id) AS rn
       |  FROM cscored) f WHERE rn <= $coarseN),
       |rescored AS (SELECT f.query_id, f.neighbor_id,
       |    ${Ann.cosineSql("qv", "cv", dim)} AS score
       |  FROM coarse f JOIN c ON c.neighbor_id = f.neighbor_id
       |  JOIN q0 ON q0.query_id = f.query_id)
       |SELECT query_id, neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, neighbor_id) AS INT) AS rank, score
       |FROM rescored
       |QUALIFY rank <= $n
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB rendering of [[mrlTopK]] as a self-search over the
    * `whereClause` slice of `embeddings`, queries = `queryWhere`
    * rows, self excluded. The prefix cosine simply folds indexes
    * `1..coarseDim` of the stored list — same arithmetic as the
    * Spark slice.
    */
  def mrlTopKSql(
      n: Int, coarseDim: Int, coarseN: Int, dim: Int,
      whereClause: String, queryWhere: String): String = {
    val preNz = s"${Ann.dotSql("embedding", "embedding", coarseDim)} > 0"
    val fullNz = s"${Ann.dotSql("embedding", "embedding", dim)} > 0"
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
       |  FROM embeddings $whereClause),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM e
       |  WHERE $fullNz AND $preNz),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
       |  ${if (queryWhere.isEmpty) "WHERE" else s"$queryWhere AND"}
       |    $fullNz AND $preNz),
       |coarse AS (SELECT query_id, neighbor_id,
       |    ${Ann.cosineSql("qv", "cv", coarseDim)} AS cscore
       |  FROM q JOIN c ON query_id <> neighbor_id),
       |funnel AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cscore DESC, neighbor_id) AS rn
       |  FROM coarse) f WHERE rn <= $coarseN),
       |rescored AS (SELECT f.query_id, f.neighbor_id,
       |    ${Ann.cosineSql("qv", "cv", dim)} AS score
       |  FROM funnel f JOIN c ON c.neighbor_id = f.neighbor_id
       |  JOIN q ON q.query_id = f.query_id)
       |SELECT query_id, neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, neighbor_id) AS INT) AS rank, score
       |FROM rescored
       |QUALIFY rank <= $n
       |ORDER BY query_id, rank""".stripMargin
  }
}
