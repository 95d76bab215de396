package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-distribution drift between two corpus slices — the corpus
  * health check run between crawl snapshots, before/after a filter
  * change, or across data sources: which terms' frequencies shifted
  * most, measured by each term's contribution to the 2×V chi-square
  * statistic of the (slice × term) contingency table. A large
  * contribution means the term is heavily over-represented in one
  * slice relative to the other — the per-term, actionable form of
  * "these corpora differ". The reference project has no text
  * pipeline; this extends SURVEY §2.5's text-analysis category.
  *
  * Determinism (why this gates engine-exactly despite doubles): each
  * term's statistic is a FIXED, per-row sequence of IEEE-754 double
  * operations on exactly-representable integer counts, written with
  * identical structure in the Spark and DuckDB renderings — +, −, ×,
  * ÷ are all exactly specified by IEEE 754 (round-to-nearest-even),
  * so both engines produce bit-identical doubles. No floating-point
  * SUM ever happens (that would be order-dependent); the only sums
  * are integer token counts.
  *
  * 100 TB shape: each side collapses to a vocabulary-sized census
  * with map-side combine (one shuffle per side, on the term — Zipf
  * head keys pre-combine per partition); the FULL OUTER join runs on
  * the two vocabulary-sized frames (AQE picks hash vs sort-merge);
  * the grand totals ride along as broadcast one-row frames; and the
  * top-k plans as TakeOrderedAndProject (per-partition heap, no
  * global sort). Text never shuffles — only (term, count) rows move.
  * The censuses are persisted by default (each feeds its total AND
  * the join — without materialization the corpus is tokenized twice
  * per side). Because the result is terminal and k-sized, the
  * persist is LOANED via [[graft.ops.Caching.withPersisted]]: the
  * top-k materializes eagerly inside the call and the census cache
  * entries are released before return, so the session's CacheManager
  * stays empty afterwards (see Caching's scaladoc for the
  * localCheckpoint trade-off). Pass `persistCensus = false` for the
  * fully-lazy plan when the caller persisted the inputs themselves.
  * Operators whose results are corpus-sized (minhash
  * `persistSignatures`, tfidf `persistInput`) keep the session-scoped
  * persist instead — loaning them would materialize frames that are
  * not small, and their cache entries are the plan a multi-query
  * session wants to reuse; release those with `unpersist`/
  * `clearCache` between pipeline stages, as Bench does per pass.
  */
object Drift {

  /** Top `k` drifted terms between slices `a` and `b`: output
    * `(term, n_a, n_b, chi2)` ordered by `chi2` desc with the term as
    * a total tie-break. Tokenization is the library rule (lowercased,
    * whitespace-split). An entirely-empty slice yields `chi2 = 0.0`
    * for every term (no evidence of drift, only of absence); a term
    * absent from one slice gets count 0 there — those are the
    * headline drift rows.
    */
  def tokenChi2(
      a: DataFrame, b: DataFrame, textColA: String, textColB: String,
      k: Int, persistCensus: Boolean = true,
  ): DataFrame = {
    require(k > 0, s"k $k must be positive")
    // each census feeds BOTH its grand total and the full-outer join;
    // without materialization Catalyst recomputes the lineage and the
    // corpus is tokenized twice per side. The persist is LOANED
    // (Caching.withPersisted): the k-row result materializes eagerly
    // and the census cache entries are released before return, so a
    // long-lived session never accumulates dead vocabulary frames.
    // persistCensus = false keeps the fully-lazy plan for callers who
    // persisted upstream themselves.
    if (persistCensus)
      graft.ops.Caching.withPersisted(
        census(a, textColA, "n_a"), census(b, textColB, "n_b")) {
        (ca, cb) => chi2TopK(ca, cb, k)
      }
    else chi2TopK(census(a, textColA, "n_a"), census(b, textColB, "n_b"), k)
  }

  private def chi2TopK(ca: DataFrame, cb: DataFrame, k: Int): DataFrame = {
    val tot = ca.agg(coalesce(sum(col("n_a")), lit(0L)).as("__na"))
      .crossJoin(cb.agg(coalesce(sum(col("n_b")), lit(0L)).as("__nb")))
    val dA = col("n_a").cast("double")
    val dB = col("n_b").cast("double")
    val nn = (col("__na") + col("__nb")).cast("double")
    val ea = (dA + dB) * col("__na").cast("double") / nn
    val eb = (dA + dB) * col("__nb").cast("double") / nn
    ca.join(cb, Seq("term"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .crossJoin(broadcast(tot))
      .withColumn("__ea", ea)
      .withColumn("__eb", eb)
      .withColumn("chi2",
        when(col("__ea") > 0,
          (dA - col("__ea")) * (dA - col("__ea")) / col("__ea"))
          .otherwise(lit(0.0)) +
        when(col("__eb") > 0,
          (dB - col("__eb")) * (dB - col("__eb")) / col("__eb"))
          .otherwise(lit(0.0)))
      .select(col("term"), col("n_a"), col("n_b"), col("chi2"))
      .orderBy(col("chi2").desc, col("term"))
      .limit(k)
  }

  private def census(df: DataFrame, textCol: String, cnt: String) =
    df.select(explode(TextFunctions.tokens(lower(col(textCol))))
        .as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as(cnt))

  /** DuckDB rendering of [[tokenChi2]] over `documents(doc_id,
    * text)`: slice A = rows matching `whereA`, slice B = rows
    * matching `whereB` (full `WHERE ...` clauses or ""). The
    * arithmetic mirrors the Spark expression structure operation for
    * operation — see the object scaladoc.
    */
  def tokenChi2Sql(k: Int, whereA: String, whereB: String): String = {
    require(k > 0, s"k $k must be positive")
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""WITH ta AS (SELECT unnest($toks) AS term FROM documents $whereA),
       |ca AS (SELECT term, CAST(count(*) AS BIGINT) AS n_a FROM ta GROUP BY 1),
       |tb AS (SELECT unnest($toks) AS term FROM documents $whereB),
       |cb AS (SELECT term, CAST(count(*) AS BIGINT) AS n_b FROM tb GROUP BY 1),
       |tot AS (SELECT (SELECT coalesce(sum(n_a), 0) FROM ca) AS na_t,
       |               (SELECT coalesce(sum(n_b), 0) FROM cb) AS nb_t),
       |j AS (SELECT coalesce(ca.term, cb.term) AS term,
       |  coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
       |  FROM ca FULL JOIN cb ON ca.term = cb.term),
       |x AS (SELECT term, n_a, n_b,
       |  (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
       |    * CAST(na_t AS DOUBLE) / CAST(na_t + nb_t AS DOUBLE) AS ea,
       |  (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
       |    * CAST(nb_t AS DOUBLE) / CAST(na_t + nb_t AS DOUBLE) AS eb
       |  FROM j, tot),
       |y AS (SELECT term, n_a, n_b,
       |  (CASE WHEN ea > 0 THEN (CAST(n_a AS DOUBLE) - ea)
       |     * (CAST(n_a AS DOUBLE) - ea) / ea ELSE 0.0 END)
       |  + (CASE WHEN eb > 0 THEN (CAST(n_b AS DOUBLE) - eb)
       |     * (CAST(n_b AS DOUBLE) - eb) / eb ELSE 0.0 END) AS chi2
       |  FROM x)
       |SELECT term, n_a, n_b, chi2 FROM y
       |ORDER BY chi2 DESC, term LIMIT $k""".stripMargin
  }
}
