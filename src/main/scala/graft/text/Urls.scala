package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL extraction and per-domain statistics — the provenance signal a
  * web-corpus pipeline needs for per-domain caps, blocklists and
  * license audits ([[graft.ops.Sampling.capPerGroup]] consumes the
  * domain column this produces).
  *
  * The URL regex stays in the Java ∩ RE2 portable subset (no
  * lookarounds, no backrefs — the [[Pii]] discipline) so the same
  * pattern runs verbatim on Spark and any RE2-based oracle engine:
  * `https?://host[/path]` with host = dot-separated
  * `[A-Za-z0-9-]+` labels and path = any non-whitespace run. The
  * label form (not a flat `[A-Za-z0-9.-]+`) means a host cannot END
  * in a dot, so sentence punctuation right after a bare domain —
  * "see https://example.com. Next" — does not leak into the host and
  * split the domain's stats between `example.com` and `example.com.`.
  *
  * 100 TB shape: extraction is a map-only codegen regex pass;
  * `domainStats` adds the one hash-shuffle its groupBy needs. The
  * explode multiplies rows by URLs-per-document (bounded small in web
  * text); nothing else amplifies.
  */
object Urls {

  private val host = "[A-Za-z0-9-]+(?:\\.[A-Za-z0-9-]+)*"
  private val urlPattern = s"https?://$host(?:/[^\\s]*)?"
  private val domainPattern = s"https?://($host)"

  /** One row per (document, URL occurrence): `(idCol, url, domain)`.
    * Documents without URLs produce no rows; duplicate URLs in one
    * document produce one row each (occurrence semantics — count
    * them, they are the signal).
    */
  def extractUrls(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    Seq("url", "domain").foreach(c =>
      require(!df.columns.contains(c),
        s"extractUrls reserves column name $c; rename it in the input"))
    // Column-level regexp_extract_all with a lit pattern — routing the
    // regex through expr()'s SQL string literal would re-interpret the
    // \s escape and silently corrupt the pattern
    df.select(col(idCol),
      explode(regexp_extract_all(col(textCol), lit(urlPattern), lit(0))).as("url"))
      .withColumn("domain", regexp_extract(col("url"), domainPattern, 1))
  }

  /** Per-domain corpus stats: `(domain, n_urls, n_docs)` — total URL
    * occurrences and distinct documents linking the domain.
    */
  def domainStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    extractUrls(df, idCol, textCol)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"), countDistinct(col(idCol)).as("n_docs"))

  /** URL canonicalization — the crawl-frontier dedup rule: lowercase,
    * scheme off, query/fragment off, leading `www.` off, trailing
    * slash off — so `https://WWW.Site.com/p/1?utm=x` and
    * `http://site.com/p/1` count as ONE page. The five rewrites are
    * regex steps in a PINNED order (each mirrored in
    * [[canonicalStatsSql]]); deliberately conservative — no path
    * normalization or param-allowlisting, which are site-specific
    * policy.
    */
  def canonicalize(url: Column): Column = {
    val lowered = lower(url)
    val noScheme = regexp_replace(lowered, "^https?://", "")
    val noQuery = regexp_replace(noScheme, "[?#].*$", "")
    val noWww = regexp_replace(noQuery, "^www\\.", "")
    regexp_replace(noWww, "/$", "")
  }

  /** Canonical-URL census: `(canon_url, n_occ, n_docs)` over the
    * extracted URLs of a corpus — duplicate-page detection across
    * scheme/case/query variants. Map-only extract + one canon-keyed
    * shuffle.
    */
  def canonicalStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    extractUrls(df, idCol, textCol)
      .select(col(idCol), canonicalize(col("url")).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col(idCol)).as("n_docs"))

  /** DuckDB rendering of [[canonicalStats]] over URL rows from
    * `urlRowsSql` (must yield `(id, url)`).
    */
  def canonicalStatsSql(urlRowsSql: String): String =
    s"""WITH u AS (SELECT id, url FROM ($urlRowsSql) q),
       |c AS (SELECT id,
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(
       |          regexp_replace(lower(url), '^https?://', ''),
       |          '[?#].*$$', ''),
       |        '^www\\.', ''),
       |      '/$$', '') AS canon_url
       |  FROM u)
       |SELECT canon_url, count(*) AS n_occ, count(DISTINCT id) AS n_docs
       |FROM c GROUP BY canon_url ORDER BY canon_url""".stripMargin
}
