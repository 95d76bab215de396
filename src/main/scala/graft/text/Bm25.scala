package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25 ranked retrieval over a document corpus — the scoring half of
  * the classic sparse-retrieval stack (the other half, top-k
  * assembly, reuses the library's heap/window patterns). Training
  * pipelines use exactly this to mine hard negatives, build RAG
  * evaluation sets, and target decontamination sweeps at query
  * workloads. The reference project has no counterpart; this extends
  * SURVEY §2.5's text-analysis category beside [[TfIdf]].
  *
  * Log-free idf, deliberately: the textbook
  * `idf = ln((N - df + 0.5)/(df + 0.5))` is not engine-exact (`ln`
  * is not correctly rounded), but BM25's ranking only needs a
  * monotone transform, so the raw odds ratio
  * `(N - df + 0.5)/(df + 0.5)` serves — every op in the whole score
  * (`+ - * /`, `floor`) IS IEEE-correctly-rounded, constants are
  * rendered into SQL via shortest-round-trip `Double.toString`, and
  * each (doc, term) score quantizes to integer micro-units before
  * the per-document sum, so results are bit-exact across engines
  * ([[topKSql]]). Note the odds idf goes NEGATIVE-analogue (below 1)
  * for terms in more than half the corpus rather than clamping at 0
  * — documents matching only stop-ubiquitous terms still rank, just
  * low; same behavior as Lucene's idf floor, different constant.
  *
  * Scale shape: documents explode map-side and are immediately
  * filtered against the BROADCAST literal query-term set, so the
  * only corpus-sized shuffle is the (doc, term) tf aggregation over
  * matching terms; the df census is term-keyed (tiny); corpus stats
  * `(N, Σdl)` are a 1-row broadcast; the final top-k is a window
  * over each query's candidate set (documents containing ≥1 query
  * term), never the full corpus.
  */
object Bm25 {

  /** Top-`k` documents per query by BM25 (odds-ratio idf, quantized).
    * `queries` are `(query_id, text)`; query terms are lowercased,
    * whitespace-split, deduplicated (query term frequency is ignored,
    * standard for short queries). Output: `(query_id, doc_id,
    * n_terms, score_micro, rnk)` with `rnk` 1-based by
    * `(score_micro desc, doc_id)`; only documents containing at
    * least one query term appear. `dl` is the FULL document token
    * count (not just matched terms).
    */
  def topK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, String)], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
  ): DataFrame = {
    require(queries.nonEmpty, "at least one query required")
    require(k >= 1, s"k $k must be >= 1")
    Seq("__toks", "__dl", "__term", "__tf", "__df", "__n", "__total")
      .foreach(c => require(!docs.columns.contains(c),
        s"topK reserves column name $c; rename it in the input"))
    val qterms = queryTerms(queries)
    val termSet = qterms.map(_._2).distinct
    val spark = docs.sparkSession

    val base = docs.select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    val stats = base.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__total"))
    val tf = base
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("__term"))
      .filter(col("__term").isInCollection(termSet))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    val dfc = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val qdf = spark.createDataFrame(
      spark.sparkContext.parallelize(qterms.map(q => Row(q._1, q._2)), 1),
      StructType(Seq(StructField("query_id", IntegerType, nullable = false),
        StructField("__term", StringType, nullable = false))))

    val scored = tf
      .join(dfc, Seq("__term"))
      .join(broadcast(qdf), Seq("__term"))
      .crossJoin(broadcast(stats))
      .withColumn("__micro", scoreMicro(k1, b))
    scored.groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).cast("int").as("n_terms"),
        sum(col("__micro")).as("score_micro"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("score_micro").desc, col(idCol))).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** The quantized per-(doc, term) score; op order mirrored
    * EXACTLY in [[topKSql]] so doubles match bit-for-bit.
    */
  private def scoreMicro(k1: Double, b: Double): Column = {
    val avgdl = col("__total").cast("double") / col("__n").cast("double")
    val idf = ((col("__n") - col("__df")).cast("double") + lit(0.5)) /
      (col("__df").cast("double") + lit(0.5))
    val norm = lit(k1) * (lit(1 - b) + lit(b) * (col("__dl").cast("double") / avgdl))
    val tfd = col("__tf").cast("double")
    val tfpart = (tfd * lit(k1 + 1)) / (tfd + norm)
    floor(idf * tfpart * lit(1e6))
  }

  private def queryTerms(queries: Seq[(Int, String)]): Seq[(Int, String)] =
    queries.flatMap { case (qid, text) =>
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .distinct.map(t => (qid, t))
    }

  /** DuckDB rendering of [[topK]] over `documents(doc_id, text)`
    * restricted to `whereClause` (a full `WHERE ...` clause or "").
    * Constants are embedded via `Double.toString` — Java's shortest
    * uniquely-identifying decimal, which DuckDB's correctly-rounded
    * parser maps back to the identical double.
    */
  def topKSql(
      queries: Seq[(Int, String)], k: Int, whereClause: String,
      k1: Double = 1.2, b: Double = 0.75,
  ): String = {
    val qterms = queryTerms(queries)
    require(qterms.nonEmpty, "at least one query term required")
    def sq(s: String): String = "'" + s.replace("'", "''") + "'"
    val qvals = qterms.map(q => s"(${q._1}, ${sq(q._2)})").mkString(", ")
    val inList = qterms.map(_._2).distinct.map(sq).mkString(", ")
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val (sk1, sb, s1mb, sk1p1) =
      (k1.toString, b.toString, (1 - b).toString, (k1 + 1).toString)
    s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents $whereClause),
       |dd AS (SELECT doc_id, len(toks) AS dl, toks FROM d),
       |st AS (SELECT count(*) AS n, sum(dl) AS total FROM dd),
       |q(query_id, term) AS (VALUES $qvals),
       |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd)
       |  WHERE term IN ($inList) GROUP BY doc_id, term),
       |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |sc AS (SELECT q.query_id, tf.doc_id,
       |    CAST(floor(
       |      ((CAST(st.n - dfc.df AS DOUBLE) + 0.5) / (CAST(dfc.df AS DOUBLE) + 0.5))
       |      * ((CAST(tf.tf AS DOUBLE) * $sk1p1)
       |         / (CAST(tf.tf AS DOUBLE)
       |            + $sk1 * ($s1mb + $sb * (CAST(tf.dl AS DOUBLE)
       |                / (CAST(st.total AS DOUBLE) / CAST(st.n AS DOUBLE))))))
       |      * 1e6) AS BIGINT) AS micro
       |  FROM tf
       |  JOIN dfc ON tf.term = dfc.term
       |  JOIN q ON tf.term = q.term
       |  CROSS JOIN st),
       |agg AS (SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_terms,
       |    CAST(sum(micro) AS BIGINT) AS score_micro
       |  FROM sc GROUP BY query_id, doc_id),
       |r AS (SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS INT) AS rnk
       |  FROM agg)
       |SELECT query_id, doc_id, n_terms, score_micro, rnk
       |FROM r WHERE rnk <= $k""".stripMargin
  }
}
