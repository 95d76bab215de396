package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level n-gram statistics against a REFERENCE corpus — the
  * n-gram-LM-lite quality/drift layer: a document whose word n-grams
  * are mostly unseen in a trusted reference is likely gibberish,
  * wrong-language, or machine-mangled (the inverse — mostly SEEN
  * n-grams against a benchmark suite — is the contamination signal,
  * cf. [[graft.dedup.Dedup.contaminationScan]]). The reference has no
  * counterpart in the reference project; this extends SURVEY §2.5's
  * text-analysis category.
  *
  * Unlike [[Vocab.oovRate]] (whose vocabulary is a bounded top-k that
  * broadcasts), the reference n-gram set here is CORPUS-SIZED —
  * billions of distinct n-grams at 100 TB — so membership is a plain
  * equi-join on the gram key with NO forced broadcast: Catalyst/AQE
  * pick sort-merge vs broadcast from measured sizes. Both sides
  * shuffle once on the gram value (the reference side pre-shrunk by
  * DISTINCT with map-side combine), and the per-document re-agg
  * ships one combined row per document per partition. Text never
  * shuffles — only grams and ids move.
  */
object Ngrams {

  /** Per-document novelty: the fraction of the document's n-gram
    * OCCURRENCES (multiset, duplicates kept — they are the signal)
    * absent from the reference's DISTINCT n-gram set. Output:
    * `(idCol, n_grams, n_novel, novelty_rate)`; a document with fewer
    * than `n` tokens has zero grams and rates `0.0` (nothing is novel
    * in nothing); an EMPTY reference rates every gram novel (`1.0`).
    * Tokenization is the library rule: lowercased, whitespace-split.
    *
    * Determinism: counts are exact integers; the rate is ONE IEEE
    * division of exactly-representable ints — engine-exact.
    */
  def noveltyRate(
      df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String, n: Int = 2,
  ): DataFrame = {
    require(n >= 1, s"n $n must be >= 1")
    Seq("__gram", "__rgram").foreach(c =>
      require(!df.columns.contains(c),
        s"noveltyRate reserves column name $c; rename it in the input"))
    val refGrams = reference
      .select(explode(TextFunctions.allGramsOf(
        TextFunctions.tokens(lower(col(refTextCol))), n)).as("__rgram"))
      .distinct()
    df.select(col(idCol),
        explode_outer(TextFunctions.allGramsOf(
          TextFunctions.tokens(lower(col(textCol))), n)).as("__gram"))
      .join(refGrams, col("__gram") === col("__rgram"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__gram")).cast("int").as("n_grams"),
        (count(col("__gram")) - count(col("__rgram"))).cast("int")
          .as("n_novel"))
      .withColumn("novelty_rate",
        when(col("n_grams") > 0,
          col("n_novel").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** DuckDB rendering of [[noveltyRate]] over `documents(doc_id,
    * text)`: score the documents matching `whereClause` against the
    * reference documents matching `refWhereClause` (full `WHERE ...`
    * clauses or "").
    */
  def noveltyRateSql(
      n: Int, whereClause: String, refWhereClause: String): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val grams = TextFunctions.allGramsSql("toks", n)
    s"""WITH rt AS (SELECT $toks AS toks FROM documents $refWhereClause),
       |rg AS (SELECT DISTINCT unnest($grams) AS rgram FROM rt),
       |dt AS (SELECT doc_id, $toks AS toks FROM documents $whereClause),
       |dg AS (SELECT doc_id, unnest($grams) AS gram FROM dt),
       |j AS (SELECT dg.doc_id, dg.gram, rg.rgram
       |  FROM dg LEFT JOIN rg ON dg.gram = rg.rgram),
       |c AS (SELECT doc_id, CAST(count(gram) AS INT) AS n_grams,
       |  CAST(count(gram) - count(rgram) AS INT) AS n_novel
       |  FROM j GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(c.n_grams, 0) AS n_grams,
       |  coalesce(c.n_novel, 0) AS n_novel,
       |  CASE WHEN coalesce(c.n_grams, 0) > 0
       |    THEN CAST(c.n_novel AS DOUBLE) / CAST(c.n_grams AS DOUBLE)
       |    ELSE 0.0 END AS novelty_rate
       |FROM (SELECT doc_id FROM documents $whereClause) d
       |LEFT JOIN c USING (doc_id)""".stripMargin
  }
}
