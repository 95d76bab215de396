package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document salient terms by tf-idf — corpus keyword extraction
  * for training-data curation (topic balance checks, boilerplate
  * spotting, near-dup triage).
  *
  * The idf factor is the LOG-FREE variant `(N + 1) / (df + 1)`:
  * division and multiplication are IEEE correctly-rounded and
  * bit-identical across engines, while `ln` is libm-dependent (Spark's
  * `Math.log` vs DuckDB's `std::log` can differ in the last ulp), so
  * this shape keeps the operator under the exact-value oracle gate.
  * Rank order per document is identical to the classic
  * `ln`-idf (log is monotone); swap `log(...)` into the score at
  * deployment without touching the plan shape.
  *
  * 100 TB shape: tokenize/explode is map-only; tf aggregates shuffle
  * on (doc, term) with map-side combine; document frequency aggregates
  * shuffle on term (vocabulary-sized, heavy-hitter safe because input
  * is the already-deduped tf set, one row per (doc, term)); the
  * df-join broadcasts when the vocabulary is bounded, else shuffles on
  * term; the final top-k is a per-document window after a shuffle on
  * doc id. The corpus count joins in as a broadcast single-row
  * aggregate — fully lazy, no driver-side action; unlike
  * [[graft.ops.Sampling.capPerGroup]]'s group counts (which grow with
  * key cardinality and take a `broadcastCounts` escape hatch), this
  * broadcast is a ONE-ROW frame whatever the corpus size, so the
  * forced hint is always safe. The df-join itself carries no hint —
  * Catalyst/AQE choose broadcast vs sort-merge from measured
  * vocabulary size.
  *
  * The tf lineage feeds both sides of the df-join (plus the corpus
  * count), so by default the plan re-reads the input per use — when
  * the corpus scan is expensive, pass `persistInput = true` (one
  * MEMORY_AND_DISK materialization of the input, every downstream use
  * reads the cache) or persist upstream yourself before calling.
  */
object TfIdf {

  /** Top `k` terms per document by tf-idf (ties → lexicographic).
    * Output: (id, term, tfidf, rnk).
    *
    * @param persistInput cache the projected input (id, text) at
    *   MEMORY_AND_DISK so the three lineage uses (tokenize, document
    *   frequency via tf, corpus count) scan the source once instead
    *   of three times. The cache entry lives until the session drops
    *   it (`spark.catalog.clearCache()` / `unpersist`); off by
    *   default so one-shot small scans don't pay materialization.
    */
  def topTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int,
      persistInput: Boolean = false,
  ): DataFrame = {
    val src0 = df.select(col(idCol).as("id"), col(textCol).as("txt"))
    val src =
      if (persistInput)
        src0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else src0
    val toks = src.select(col("id"),
      explode(TextFunctions.tokens(lower(col("txt")))).as("term"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    // corpus size as a broadcast single-row join — the plan-time
    // scalar the oracle writes as (SELECT count(*) FROM d), with no
    // eager action at plan-construction time
    val corpusN = src.agg(count(lit(1)).as("corpus_n"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(docFreq, Seq("term"))
      .crossJoin(broadcast(corpusN))
      .select(col("id"), col("term"),
        (col("tf").cast("double") *
          ((col("corpus_n").cast("double") + 1.0) /
            (col("df").cast("double") + 1.0))).as("tfidf"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("id"), col("term"), col("tfidf"), col("rnk"))
  }

  /** DuckDB rendering of [[topTerms]] over `documents(doc_id, text)`
    * restricted by `whereClause`.
    */
  def topTermsSql(k: Int, whereClause: String = ""): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""WITH d AS (SELECT doc_id AS id, text FROM documents $whereClause),
       |toks AS (SELECT id, unnest($toks) AS term FROM d),
       |tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT id, term,
       |    CAST(tf AS DOUBLE) *
       |      ((CAST((SELECT count(*) FROM d) AS DOUBLE) + 1.0) /
       |       (CAST(df AS DOUBLE) + 1.0)) AS tfidf
       |  FROM tf JOIN dfreq USING (term)),
       |ranked AS (SELECT id, term, tfidf,
       |    CAST(row_number() OVER (PARTITION BY id
       |      ORDER BY tfidf DESC, term) AS INT) AS rnk
       |  FROM scored)
       |SELECT id, term, tfidf, rnk FROM ranked
       |WHERE rnk <= $k ORDER BY id, rnk""".stripMargin
  }
}
