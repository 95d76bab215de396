package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space drift between corpus slices — the semantic
  * monitoring twin of `graft.text.Drift`'s token-distribution χ²:
  * per group (label/source/snapshot), the centroid of its embedding
  * cloud, then pairwise cosine between centroids. A retrieval/dedup
  * pipeline watches this across snapshots: a centroid pair drifting
  * from ~1.0 means the slices stopped talking about the same things
  * (domain shift, crawler drift, a poisoned source).
  *
  * Engine-exactness is the whole design: naive `avg` over doubles is
  * ORDER-DEPENDENT under partial aggregation (Spark's partials vs
  * DuckDB's scan order), so nothing here sums raw doubles. Each
  * component quantizes to integer micro-units FIRST
  * (`floor(x·1e6)`), per-(group, dim) sums are exact BIGINTs (order-
  * free), per-dim means are one exact-operand IEEE division, the
  * pairwise dot/norm terms quantize each one-multiply product back
  * to integers, and the final cosine is three IEEE ops on exact
  * BIGINTs. Bounds: |x| ≤ ~10 ⇒ per-dim sums ≤ n·1e7; per-dim
  * product terms ≤ 1e14, 64-dim totals ≤ 1e16 — inside BIGINT.
  *
  * Scale shape: one corpus-scale pass (posexplode → (group, dim)
  * partial sums, the only shuffle — groups·64 cells); everything
  * after runs on the cell frame. Pairs are group², tiny.
  *
  * Output: `(label_a, label_b, n_a, n_b, cos_micro)` with
  * `cos_micro = floor(cosine · 1e6)`.
  */
object CentroidDrift {

  def pairwiseCosine(
      df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val cells = df.filter(col(vecCol).isNotNull)
      .select(col(groupCol).as("g"),
        posexplode(col(vecCol)).as(Seq("p", "x")))
      .groupBy(col("g"), col("p"))
      .agg(sum(floor(col("x").cast("double") * lit(1e6)).cast("long"))
          .as("s"),
        count(lit(1)).as("n"))
      .select(col("g"), col("p"),
        (col("s").cast("double") / col("n").cast("double")).as("m"),
        col("n"))
    val a = cells.select(col("g").as("label_a"), col("p"),
      col("m").as("ma"), col("n").as("n_a"))
    val b = cells.select(col("g").as("label_b"), col("p"),
      col("m").as("mb"), col("n").as("n_b"))
    a.join(b, Seq("p")).filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(floor(col("ma") * col("mb")).cast("long")).as("dot_q"),
        sum(floor(col("ma") * col("ma")).cast("long")).as("na_q"),
        sum(floor(col("mb") * col("mb")).cast("long")).as("nb_q"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        floor(col("dot_q").cast("double") /
          (sqrt(col("na_q").cast("double")) * sqrt(col("nb_q").cast("double")))
          * lit(1e6)).cast("long").as("cos_micro"))
  }

  /** DuckDB rendering of [[pairwiseCosine]] over
    * `embeddings(label, embedding)` restricted by `whereClause`.
    */
  def pairwiseCosineSql(whereClause: String): String =
    s"""WITH e AS (SELECT label AS g, embedding AS v FROM embeddings
       |  $whereClause),
       |comp AS (SELECT g, CAST(i - 1 AS INT) AS p,
       |    CAST(floor(CAST(v[CAST(i AS INT)] AS DOUBLE) * 1e6) AS BIGINT) AS q
       |  FROM e, unnest(range(1, len(v) + 1)) AS u(i)),
       |cells AS (SELECT g, p,
       |    CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m,
       |    COUNT(*) AS n
       |  FROM comp GROUP BY g, p),
       |pairs AS (SELECT a.g AS label_a, b.g AS label_b,
       |    MAX(a.n) AS n_a, MAX(b.n) AS n_b,
       |    SUM(CAST(floor(a.m * b.m) AS BIGINT)) AS dot_q,
       |    SUM(CAST(floor(a.m * a.m) AS BIGINT)) AS na_q,
       |    SUM(CAST(floor(b.m * b.m) AS BIGINT)) AS nb_q
       |  FROM cells a JOIN cells b ON a.p = b.p AND a.g < b.g
       |  GROUP BY 1, 2)
       |SELECT label_a, label_b,
       |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |  CAST(floor(CAST(dot_q AS DOUBLE)
       |    / (sqrt(CAST(na_q AS DOUBLE)) * sqrt(CAST(nb_q AS DOUBLE)))
       |    * 1e6) AS BIGINT) AS cos_micro
       |FROM pairs ORDER BY label_a, label_b""".stripMargin
}
