package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: redact emails, IPv4 addresses
  * and NANP-style phone numbers, and count what was found — the
  * standard pre-training hygiene pass (the reference has no text
  * pipeline; this extends SURVEY §2.5's text-analysis category).
  *
  * Pure per-row `Column` expressions (codegen'd `regexp_replace` /
  * `regexp_count` chains — no UDFs, no shuffles): at 100 TB this runs
  * map-side inside whole-stage codegen and composes with column
  * pruning like any projection.
  *
  * The patterns restrict themselves to syntax with identical semantics
  * in Java regex (Spark) and RE2 (DuckDB oracle): character classes,
  * bounded repetition, `\b`/`\d` — no backrefs, no lookaround.
  * Redaction order is email → IPv4 → phone on both engines;
  * replacement tokens contain no digits or dots, so later passes
  * cannot match inside an earlier replacement.
  */
object Pii {

  /** `local@domain.tld` — the tld wants ≥2 letters, so dotted quads
    * (`user@10.0.0.1`) are left for the IPv4 pass.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted quad. Deliberately permissive (no 0-255 range check):
    * over-redaction is the safe direction for a scrubber.
    */
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP `NXX-NXX-XXXX` with literal dashes. */
  val phonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  private val passes = Seq(
    emailPattern -> "<EMAIL>",
    ipv4Pattern -> "<IP>",
    phonePattern -> "<PHONE>")

  /** Text with all three PII classes replaced by their tokens. */
  def redact(text: Column): Column =
    passes.foldLeft(text) { case (acc, (pat, tok)) =>
      regexp_replace(acc, lit(pat), lit(tok))
    }

  /** DuckDB rendering of [[redact]] for SQL expression `textExpr`
    * (DuckDB's `regexp_replace` is first-match-only without the `'g'`
    * flag — Spark's always-global behavior needs it spelled out).
    */
  def redactSql(textExpr: String): String =
    passes.foldLeft(textExpr) { case (acc, (pat, tok)) =>
      s"regexp_replace($acc, '$pat', '$tok', 'g')"
    }

  /** `(idCol, clean_text, n_emails, n_ipv4, n_phones)`: counts are
    * taken on the original text, redaction order as documented.
    */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      redact(col(textCol)).as("clean_text"),
      regexp_count(col(textCol), lit(emailPattern)).cast("int").as("n_emails"),
      regexp_count(col(textCol), lit(ipv4Pattern)).cast("int").as("n_ipv4"),
      regexp_count(col(textCol), lit(phonePattern)).cast("int").as("n_phones"))

  /** Per-source PII exposure census — the privacy release gate a
    * corpus publisher runs BEFORE the redaction pass: which ingest
    * sources leak identifiers, at what rate, and of which class.
    * One map-combined corpus pass (per-row codegen'd `regexp_count`,
    * then a source-keyed census bounded by source cardinality); the
    * text never shuffles. Output: `(source, n_docs, n_flagged,
    * n_emails, n_ipv4, n_phones, flagged_ppm)` — `n_flagged` counts
    * documents with ANY hit, ppm in integer `div` arithmetic.
    */
  def rateBySource(
      df: DataFrame, sourceCol: String, textCol: String): DataFrame =
    df.select(col(sourceCol).as("source"),
        regexp_count(col(textCol), lit(emailPattern)).cast("long").as("e"),
        regexp_count(col(textCol), lit(ipv4Pattern)).cast("long").as("i"),
        regexp_count(col(textCol), lit(phonePattern)).cast("long").as("p"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("e") + col("i") + col("p") > 0, 1L).otherwise(0L))
          .as("n_flagged"),
        sum(col("e")).as("n_emails"), sum(col("i")).as("n_ipv4"),
        sum(col("p")).as("n_phones"))
      .withColumn("flagged_ppm", expr("n_flagged * 1000000L div n_docs"))

  /** DuckDB rendering of [[rateBySource]]; `fromClause` supplies the
    * `(source, text)` rows.
    */
  def rateBySourceSql(fromClause: String): String = {
    def cnt(pat: String, as: String) =
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS $as"
    s"""WITH d AS (SELECT source, ${cnt(emailPattern, "e")},
       |    ${cnt(ipv4Pattern, "i")}, ${cnt(phonePattern, "p")}
       |  FROM $fromClause),
       |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_flagged,
       |    CAST(sum(e) AS BIGINT) AS n_emails,
       |    CAST(sum(i) AS BIGINT) AS n_ipv4,
       |    CAST(sum(p) AS BIGINT) AS n_phones
       |  FROM d GROUP BY source)
       |SELECT source, n_docs, n_flagged, n_emails, n_ipv4, n_phones,
       |  (n_flagged * 1000000) // n_docs AS flagged_ppm
       |FROM c ORDER BY source""".stripMargin
  }

  /** DuckDB rendering of [[scrub]]'s projection (no FROM clause —
    * caller supplies source and ordering; `idExpr`/`textExpr` are SQL
    * expressions).
    */
  def scrubSelectSql(idExpr: String, textExpr: String): String = {
    def cnt(pat: String, as: String) =
      s"CAST(len(regexp_extract_all($textExpr, '$pat')) AS INT) AS $as"
    s"""$idExpr,
       |  ${redactSql(textExpr)} AS clean_text,
       |  ${cnt(emailPattern, "n_emails")},
       |  ${cnt(ipv4Pattern, "n_ipv4")},
       |  ${cnt(phonePattern, "n_phones")}""".stripMargin
  }
}
