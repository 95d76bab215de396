package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) — the standard hybrid-retrieval
  * combiner: each system contributes `1 / (k0 + rank)` for every
  * document it ranked, documents are scored by the sum over systems,
  * and the fused ranking reorders by that sum. RRF needs no score
  * calibration between systems (only ranks), which is exactly why
  * hybrid sparse+dense stacks (BM25 ⊕ embedding cosine) use it for
  * hard-negative mining and RAG retrieval — the two scores live on
  * incomparable scales.
  *
  * Engine-exactness: contributions are quantized to nano-units,
  * `floor(1e9 / (k0 + rank))` — for ranks ≤ a few thousand the IEEE
  * quotient is ≥ 1e5 off any integer boundary relative to its ULP,
  * so the floor is unambiguous and identical across engines; sums of
  * BIGINT nano-units are exact. Ties in the fused ranking break by
  * document id ascending.
  *
  * Scale shape: the inputs are per-query top-k lists — at most
  * `queries × k` rows per system REGARDLESS of corpus size (the
  * corpus-scale work lives inside each system: [[graft.text.Bm25]]'s
  * broadcast term filter, [[Ann.bruteForceTopK]]'s scored join).
  * Fusion itself is a union + one tiny keyed aggregation + one
  * window over per-query candidate sets; at 100 TB it is driver-dust
  * no matter how large the corpus was.
  */
object Fusion {

  /** Nano-unit RRF contribution of a 1-based rank. */
  def rrfContrib(rnk: Column, k0: Int): Column =
    floor(lit(1e9) / (lit(k0.toDouble) + rnk.cast("double"))).cast("long")

  /** Fuse ranked lists. Each input must expose `(query_id, doc_id,
    * rnk)` (1-based ranks); documents absent from a system simply get
    * no contribution from it (RRF over top-k lists, the standard
    * formulation). Output: `(query_id, doc_id, n_systems, rrf_nano,
    * rnk)` with the fused `rnk` 1-based by `(rrf_nano desc, doc_id)`,
    * truncated to `k`.
    */
  def rrfFuse(systems: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(systems.nonEmpty, "at least one ranked system required")
    require(k >= 1, s"k $k must be >= 1")
    require(k0 >= 1, s"k0 $k0 must be >= 1 (the RRF damping constant)")
    val u = systems
      .map(_.select(col("query_id"), col("doc_id"), col("rnk")))
      .reduce(_ unionByName _)
    val fused = u.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_systems"),
        sum(rrfContrib(col("rnk"), k0)).as("rrf_nano"))
    fused.withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_nano").desc, col("doc_id"))).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** DuckDB rendering of [[rrfFuse]] over two ranked subqueries.
    * `sparseSql` must yield `(query_id, doc_id, rnk)` and `denseSql`
    * `(query_id, neighbor_id, rank, …)` (the [[Ann.bruteForceTopK]]
    * shape — renamed here); both may carry their own WITH clauses
    * (DuckDB accepts CTEs inside subqueries).
    */
  def rrfFuseSql(sparseSql: String, denseSql: String, k: Int, k0: Int = 60): String =
    s"""WITH sparse AS (SELECT query_id, doc_id, rnk FROM ($sparseSql) s),
       |dense AS (SELECT CAST(query_id AS INT) AS query_id,
       |    neighbor_id AS doc_id, rank AS rnk FROM ($denseSql) d),
       |u AS (SELECT * FROM sparse UNION ALL SELECT * FROM dense),
       |f AS (SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_systems,
       |    CAST(sum(CAST(floor(1000000000.0 / ($k0 + rnk)) AS BIGINT)) AS BIGINT)
       |      AS rrf_nano
       |  FROM u GROUP BY query_id, doc_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_nano DESC, doc_id) AS INT) AS rnk FROM f)
       |SELECT query_id, doc_id, n_systems, rrf_nano, rnk FROM r
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
}
