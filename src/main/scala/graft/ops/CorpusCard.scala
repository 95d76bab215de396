package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{QualityFilters, TextFunctions}

/** Corpus card — the per-source datasheet a data team publishes with
  * a training corpus (the "Datasheets for Datasets" practice, Gebru
  * et al. 2021, reduced to the numbers curation decisions actually
  * read): document and token inventory, language share, quality-rule
  * pass rate, and exact-duplicate rate, one row per source.
  *
  * All rates are exact integer parts-per-million (`div` == `//` on
  * non-negatives). The duplicate rate counts occurrences beyond each
  * fingerprint's first WITHIN the source (normalization-invariant
  * [[TextFunctions.fingerprint]]): cross-source duplication is
  * [[graft.dedup.Provenance]]'s matrix; near-duplication is the
  * MinHash family's census — this card is the cheap always-on
  * summary, not the dedup pass.
  *
  * 100 TB shape: one map-side projection computes every per-doc
  * signal (tokens, fingerprint, the 7 integer quality rules — all
  * codegen Column exprs), then two source-keyed hash aggregations
  * (the fingerprint census pre-groups on (source, fp), so the final
  * fold sees one row per distinct fingerprint) joined on the
  * #sources-sized result. Text never shuffles; nothing broadcasts.
  */
object CorpusCard {

  /** One row per source: `(source, n_docs, total_tokens, en_ppm,
    * quality_pass_ppm, exact_dup_ppm)`.
    */
  def corpusCard(
      df: DataFrame, textCol: String, sourceCol: String, langCol: String,
      cfg: QualityFilters.Config = QualityFilters.Config(),
  ): DataFrame = {
    val flagged = QualityFilters.withRules(
      df.select(col(sourceCol).as("source"), col(langCol).as("lang"),
        col(textCol)),
      textCol, cfg)
    val base = flagged.select(col("source"), col("lang"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("__nt"),
      TextFunctions.fingerprint(col(textCol)).as("__fp"),
      col("passes"))
    val dupCensus = base
      .groupBy(col("source"), col("__fp"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("source"))
      .agg(sum(col("__c") - 1L).as("__dups"))
    base
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("total_tokens"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("__en"),
        sum(when(col("passes"), 1L).otherwise(0L)).as("__pass"))
      .join(dupCensus, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr("(__en * 1000000L) div n_docs").as("en_ppm"),
        expr("(__pass * 1000000L) div n_docs").as("quality_pass_ppm"),
        expr("(__dups * 1000000L) div n_docs").as("exact_dup_ppm"))
  }

  /** DuckDB rendering of [[corpusCard]]; `from` is the source
    * relation exposing `(text, lang, source)` (a table name or a
    * parenthesized subquery for planted fixtures), restricted by
    * `whereClause`.
    */
  def corpusCardSql(
      whereClause: String,
      cfg: QualityFilters.Config = QualityFilters.Config(),
      from: String = "documents",
  ): String = {
    def t(s: String): String = s.replace("TXT", "text")
    val toks = t(TextFunctions.tokensSql)
    val fp = t(TextFunctions.fingerprintSql)
    val passes = QualityFilters.rulesSql(cfg).map(r => t(r._2))
      .mkString("(", " AND ", ")")
    s"""WITH f AS (SELECT source, lang,
       |    CAST(len($toks) AS BIGINT) AS nt,
       |    $fp AS fp,
       |    $passes AS passes
       |  FROM $from $whereClause),
       |fc AS (SELECT source, fp, count(*) AS c
       |  FROM f GROUP BY source, fp),
       |d AS (SELECT source, CAST(sum(c - 1) AS BIGINT) AS dups
       |  FROM fc GROUP BY source),
       |a AS (SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(nt) AS BIGINT) AS total_tokens,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS en,
       |    CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS pass
       |  FROM f GROUP BY source)
       |SELECT a.source, n_docs, total_tokens,
       |  CAST((en * 1000000) // n_docs AS BIGINT) AS en_ppm,
       |  CAST((pass * 1000000) // n_docs AS BIGINT) AS quality_pass_ppm,
       |  CAST((dups * 1000000) // n_docs AS BIGINT) AS exact_dup_ppm
       |FROM a JOIN d USING (source)""".stripMargin
  }
}
