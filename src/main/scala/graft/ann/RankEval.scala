package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics over a ranked run — the eval harness
  * that closes the ANN family's loop: the recall gates answer "did
  * the index find the exact-cosine neighbors"; this answers "were
  * the neighbors any GOOD", scoring a run against relevance labels
  * (label-match relevance — the standard proxy when no human
  * judgments exist). Per query: MRR (reciprocal rank of the first
  * relevant hit), capped recall@k (hits / min(k, total relevant)),
  * and nDCG@k.
  *
  * Determinism: every metric is integer ppm. The DCG position
  * weights `floor(1e6 / log2(rank+1))` involve a transcendental, so
  * they are computed ONCE driver-side and embedded as literals in
  * BOTH the Spark plan and the generated oracle SQL — the engines
  * never evaluate a log. Ideal DCG is the prefix sum of the same
  * literal table over min(k, n_rel) positions.
  *
  * 100 TB shape: the run is queries×k rows (corpus-size-independent
  * — the fusion-stage stance); labels join on id equi-keys; the
  * per-label corpus census is label-cardinality-sized and
  * broadcasts. Metrics aggregate per query — one queries×k-bounded
  * shuffle.
  */
object RankEval {

  /** `floor(1e6 / log2(rank+1))` for ranks 1..k — evaluated once
    * here; both engines consume the same numbers.
    */
  def dcgWeightsPpm(k: Int): Seq[Long] =
    (1 to k).map(r => math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** Prefix sums of [[dcgWeightsPpm]] — ideal DCG for 1..k relevant. */
  def idcgPrefixPpm(k: Int): Seq[Long] =
    dcgWeightsPpm(k).scanLeft(0L)(_ + _).tail

  /** `runs`: `(query_id, neighbor_id, rank)` with rank 1..k.
    * `labels`: `(id, label)` covering queries and corpus (a query's
    * own row is assumed excluded from the run — the bruteForceTopK
    * excludeSelf contract — so its label contributes n_rel = count-1).
    * Output per query: `(query_id, n_rel, mrr_ppm, recall_ppm,
    * ndcg_ppm)`; all three are 0 when the label has no other member.
    */
  def metrics(runs: DataFrame, labels: DataFrame, idCol: String,
      labelCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k $k out of [1, 100]")
    val w = dcgWeightsPpm(k)
    val idcg = idcgPrefixPpm(k)
    val wExpr = w.mkString("array(", "L,", "L)")
    val idcgExpr = idcg.mkString("array(", "L,", "L)")
    val lab = labels.select(col(idCol).as("__id"),
      col(labelCol).as("__lab"))
    val labCounts = lab.groupBy(col("__lab"))
      .agg(count(lit(1)).as("__lab_n"))
    val qLab = lab.select(col("__id").as("query_id"),
      col("__lab").as("__qlab"))
    val nLab = lab.select(col("__id").as("neighbor_id"),
      col("__lab").as("__nlab"))
    runs
      .join(qLab, Seq("query_id"))
      .join(nLab, Seq("neighbor_id"))
      .withColumn("__rel",
        when(col("__qlab") === col("__nlab"), lit(1L)).otherwise(lit(0L)))
      .groupBy(col("query_id"), col("__qlab"))
      .agg(
        min(when(col("__rel") === 1L, col("rank"))).as("__first_rel"),
        sum(col("__rel")).as("__hits"),
        sum(when(col("__rel") === 1L,
          expr(s"element_at($wExpr, CAST(rank AS INT))"))
          .otherwise(lit(0L))).as("__dcg"))
      .join(broadcast(labCounts),
        col("__qlab") === labCounts("__lab"))
      .select(col("query_id"),
        (col("__lab_n") - 1L).as("n_rel"),
        coalesce(expr("1000000L div __first_rel"), lit(0L)).as("mrr_ppm"),
        when(col("__lab_n") > 1L,
          expr(s"(__hits * 1000000L) div least(__lab_n - 1L, ${k}L)"))
          .otherwise(lit(0L)).as("recall_ppm"),
        when(col("__lab_n") > 1L,
          expr(s"(__dcg * 1000000L) div element_at($idcgExpr, " +
            s"CAST(least(__lab_n - 1L, ${k}L) AS INT))"))
          .otherwise(lit(0L)).as("ndcg_ppm"))
  }

  /** DuckDB rendering: layers the same literal-weight arithmetic on
    * a `ranked(query_id, neighbor_id, rank)` CTE and a
    * `lab(id, label)` CTE (both defined upstream in the WITH).
    */
  def metricsSql(k: Int): String = {
    val w = dcgWeightsPpm(k).mkString("[", ",", "]")
    val idcg = idcgPrefixPpm(k).mkString("[", ",", "]")
    s"""labc AS (SELECT label AS lab, CAST(count(*) AS BIGINT) AS lab_n
       |  FROM lab GROUP BY 1),
       |joined AS (SELECT r.query_id, r.rank, ql.label AS qlab,
       |    CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
       |  FROM ranked r
       |  JOIN lab ql ON ql.id = r.query_id
       |  JOIN lab nl ON nl.id = r.neighbor_id),
       |per_q AS (SELECT query_id, qlab,
       |    min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
       |    CAST(SUM(rel) AS BIGINT) AS hits,
       |    CAST(SUM(CASE WHEN rel = 1 THEN ($w)[rank] ELSE 0 END)
       |      AS BIGINT) AS dcg
       |  FROM joined GROUP BY 1, 2)
       |SELECT p.query_id, c.lab_n - 1 AS n_rel,
       |  CAST(COALESCE(1000000 // first_rel, 0) AS BIGINT) AS mrr_ppm,
       |  CAST(CASE WHEN c.lab_n > 1
       |    THEN (hits * 1000000) // least(c.lab_n - 1, $k)
       |    ELSE 0 END AS BIGINT) AS recall_ppm,
       |  CAST(CASE WHEN c.lab_n > 1
       |    THEN (dcg * 1000000) //
       |      ($idcg)[CAST(least(c.lab_n - 1, $k) AS INT)]
       |    ELSE 0 END AS BIGINT) AS ndcg_ppm
       |FROM per_q p JOIN labc c ON p.qlab = c.lab""".stripMargin
  }
}
