package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary census: the top-k tokens by corpus frequency with
  * their document frequencies — the first pass of tokenizer training
  * (BPE seed vocab), stopword-list construction, and domain-shift
  * checks between corpus versions. The reference has no text pipeline;
  * this extends SURVEY §2.5's text-analysis category.
  *
  * 100 TB shape: tokenize/explode is map-only; the frequency aggregate
  * shuffles once on the token value with map-side combine (vocabulary-
  * sized reducers, and natural-language token frequencies are Zipfian —
  * the hot "the" key still combines map-side, so no reducer sees the
  * raw corpus volume); the final top-k plans as TakeOrderedAndProject —
  * a per-partition heap of k rows merged on the driver, NOT a global
  * sort and never a single-partition window. Keep k bounded (it is a
  * driver-merged result); for a full vocabulary dump, drop the limit
  * and write the aggregate directly.
  */
object Vocab {

  /** Top `k` tokens (lowercased, whitespace-split — the
    * [[TextFunctions.tokens]] definition) by corpus frequency.
    * Output: `(term, n_total, n_docs)`, ordered by `n_total` desc with
    * the term as a total tie-break, so the cut is deterministic.
    */
  def topTokens(
      df: DataFrame, idCol: String, textCol: String, k: Int,
  ): DataFrame = {
    require(k > 0, s"k $k must be positive")
    df.select(col(idCol).as("__doc"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("__doc")).as("n_docs"))
      .orderBy(col("n_total").desc, col("term"))
      .limit(k)
  }

  /** DuckDB rendering of [[topTokens]] over `documents(doc_id, text)`
    * restricted by `whereClause` (a full `WHERE ...` clause or "").
    */
  def topTokensSql(k: Int, whereClause: String): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""WITH t AS (SELECT doc_id, unnest($toks) AS term
       |  FROM documents $whereClause),
       |v AS (SELECT term, CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       |  FROM t GROUP BY 1)
       |SELECT term, n_total, n_docs FROM v
       |ORDER BY n_total DESC, term LIMIT $k""".stripMargin
  }
}
