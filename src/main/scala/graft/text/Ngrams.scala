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

  /** Collocation mining by PMI-surrogate LIFT: for adjacent token
    * pairs, `lift(a,b) = P(ab) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)` —
    * a strictly monotone transform of pointwise mutual information
    * (PMI = ln lift), log-free so it sits under the hash gate like
    * [[graft.text.Lm]]'s surprise. High-lift pairs are multiword
    * expressions ("san francisco", "machine learning") — tokenizer
    * vocab candidates and phrase-mining input.
    *
    * Engine-exactness: the censuses are exact BIGINTs; the score is
    * `floor(n_ab·N / (n_a·n_b) · 1e6)` computed as doubles in that
    * pinned op order (products first, one division, one scale) —
    * double rounding is deterministic per IEEE, identical across
    * engines. Ranking ties break by gram ascending.
    *
    * Scale shape: one corpus pass for each census (the [[graft.text.Lm]]
    * topology), a bigram→unigram equi-join ×2, and a TakeOrdered
    * top-k — no corpus-sized sort, no broadcast of corpus-sized
    * frames.
    *
    * Output: top-`k` `(gram, n_ab, lift_micro)` by
    * `(lift_micro desc, gram)`, restricted to `n_ab ≥ minCount`
    * (rare-pair lift is noise — the classic PMI failure mode).
    */
  def collocationLift(
      df: DataFrame, textCol: String, k: Int, minCount: Long = 3L,
  ): DataFrame = {
    val toks = df.select(
      graft.text.TextFunctions.tokens(lower(col(textCol))).as("__toks"))
    val uni = toks.select(explode(col("__toks")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
    val total = toks.select(explode(col("__toks")).as("__w"))
      .agg(count(lit(1)).as("__t"))
    val bi = toks
      .select(explode(graft.text.TextFunctions.allGramsOf(col("__toks"), 2))
        .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    bi.withColumn("__w1", substring_index(col("gram"), " ", 1))
      .withColumn("__w2", substring_index(col("gram"), " ", -1))
      .join(uni.select(col("__w").as("__w1"), col("__n").as("__na")), Seq("__w1"))
      .join(uni.select(col("__w").as("__w2"), col("__n").as("__nb")), Seq("__w2"))
      .crossJoin(broadcast(total))
      .select(col("gram"), col("n_ab"),
        floor((col("n_ab").cast("double") * col("__t").cast("double")) /
          (col("__na").cast("double") * col("__nb").cast("double")) * lit(1e6))
          .cast("long").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("gram"))
      .limit(k)
  }

  /** DuckDB rendering of [[collocationLift]] over `documents(text)`
    * restricted by `whereClause`.
    */
  def collocationLiftSql(
      whereClause: String, k: Int, minCount: Long = 3L): String = {
    val toks = graft.text.TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val grams = graft.text.TextFunctions.allGramsSql("toks", 2)
    s"""WITH d AS (SELECT $toks AS toks FROM documents $whereClause),
       |uni AS (SELECT w, count(*) AS n
       |  FROM (SELECT unnest(toks) AS w FROM d) GROUP BY w),
       |tot AS (SELECT count(*) AS t FROM (SELECT unnest(toks) AS w FROM d)),
       |bi AS (SELECT gram, count(*) AS n_ab
       |  FROM (SELECT unnest($grams) AS gram FROM d)
       |  GROUP BY gram HAVING count(*) >= $minCount)
       |SELECT gram, n_ab,
       |  CAST(floor((CAST(n_ab AS DOUBLE) * CAST(tot.t AS DOUBLE))
       |    / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)) * 1e6) AS BIGINT)
       |    AS lift_micro
       |FROM bi
       |JOIN uni a ON string_split(gram, ' ')[1] = a.w
       |JOIN uni b ON string_split(gram, ' ')[-1] = b.w
       |CROSS JOIN tot
       |ORDER BY lift_micro DESC, gram LIMIT $k""".stripMargin
  }
}
