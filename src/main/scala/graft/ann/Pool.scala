package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-to-document embedding pooling — the aggregation every
  * long-document retrieval pipeline runs between the encoder and the
  * index: documents are embedded as CHUNKS
  * ([[graft.text.Chunking.slidingWindows]] upstream), and the
  * document-level vector is the mean of its chunk vectors. Mean
  * pooling is the standard first choice (it commutes with cosine
  * against mean-pooled queries and needs no weights).
  *
  * Determinism: a float mean is an ordered sum, so pooling QUANTIZES
  * each component (`floor(x * 2^20)` — IEEE-exact on float-in-double,
  * the [[Jl]] device) and emits the integer
  * `mean_micro = (sum * 1000000) div count` per dimension —
  * order-free, hash-gateable, and still ~6 significant digits of the
  * true mean (the quantization floor is 1e-6 per component, far
  * below encoder noise).
  *
  * 100 TB shape: one posexplode (rows × dim — the [[DimStats]]
  * stance) and ONE (group, dim)-keyed map-combined aggregate; no
  * joins. Output stays flattened `(group, dim_idx, n_chunks,
  * mean_micro)` — reassembling arrays is the consumer's choice, and
  * flat rows are what the gate hashes.
  */
object Pool {

  private val Scale = 1L << 20

  /** Mean-pool `vecCol` over `groupCol`: `(group, dim_idx, n_chunks,
    * mean_micro)` with `dim_idx` 0-based.
    *
    * CONTRACT: every vector component must lie in `[-1, 1]`
    * (unit-normalized encoder output). The div-parity offset below
    * only covers that range — components below -1 would make Spark's
    * truncating `div` and DuckDB's flooring `//` diverge by 1 — so
    * the quantizer raises on any out-of-range component rather than
    * silently splitting the engines.
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("group"),
      posexplode(col(vecCol)).as(Seq("dim_idx", "__x")))
      .select(col("group"), col("dim_idx").cast("long").as("dim_idx"),
        expr(s"""CASE WHEN __x >= -1.0D AND __x <= 1.0D
                 |  THEN CAST(floor(CAST(__x AS DOUBLE) * ${Scale}L) AS BIGINT)
                 |  ELSE CAST(raise_error(CONCAT(
                 |    'Pool.meanPool: component outside [-1, 1]: ',
                 |    CAST(__x AS STRING))) AS BIGINT) END""".stripMargin)
          .as("__q"))
      .groupBy(col("group"), col("dim_idx"))
      .agg(count(lit(1)).as("n_chunks"),
        // the +count·2^20 offset keeps the numerator non-negative:
        // Spark div truncates toward zero, DuckDB // floors — they
        // only agree on non-negative operands (the s_k_anon device)
        expr(s"((sum(__q) + count(1) * ${Scale}L) * 1000000) div count(1)" +
          s" - ${Scale}L * 1000000").as("mean_micro"))

  /** DuckDB rendering over `(groupExpr, vecExpr)` rows from
    * `fromClause` — index explode via the range cross join (the
    * [[DimStats]] device; DuckDB 1.0 has no WITH ORDINALITY). `dim`
    * must match the vector width.
    */
  def meanPoolSql(fromClause: String, groupExpr: String,
      vecExpr: String, dim: Int): String =
    s"""SELECT $groupExpr AS "group",
       |  CAST(t.i - 1 AS BIGINT) AS dim_idx,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(((SUM(CAST(floor(CAST(($vecExpr)[t.i] AS DOUBLE) * $Scale)
       |        AS BIGINT)) + count(*) * CAST($Scale AS BIGINT))
       |      * CAST(1000000 AS BIGINT)) // count(*)
       |    - CAST($Scale AS BIGINT) * 1000000 AS BIGINT) AS mean_micro
       |FROM $fromClause,
       |  unnest(range(1, ${dim + 1})) AS t(i)
       |GROUP BY 1, 2""".stripMargin
}
