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

  /** Card-shaped digit runs: 13-19 digits with optional single
    * space/dash separators. Deliberately wide — the LUHN CHECK is
    * the precision stage, not the regex.
    */
  val cardPattern = "\\b(?:\\d[ -]?){12,18}\\d\\b"

  /** Luhn-validated payment-card detection — the checksum pass every
    * serious PII scrubber runs AFTER the card regex, because 16-digit
    * runs are everywhere (ids, hashes, timestamps) and only ~10% of
    * them pass Luhn by chance: mod-10 double-every-second-from-the-
    * right. Per document: candidate count and how many validate —
    * the prioritization signal (a corpus full of Luhn-valid runs is
    * a breach; Luhn-invalid runs are noise).
    *
    * All-integer HOF fold over the candidate's digit string; map-only
    * at any corpus size (the [[scrub]] stance). The fold and the
    * regex are spelled identically in [[cardScanSql]].
    */
  def cardScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Spark SQL string literals process backslash escapes ('\d' would
    // be an escape, not a regex class) — double them for the parser;
    // DuckDB single-quoted literals take backslashes raw
    val patSql = cardPattern.replace("\\", "\\\\")
    val cands = s"regexp_extract_all($textCol, '$patSql', 0)"
    val digits = s"transform($cands, c -> regexp_replace(c, '[ -]', ''))"
    val valid =
      s"""aggregate($digits, 0L, (acc, d) -> acc +
         |  (CASE WHEN length(d) BETWEEN 13 AND 19 AND
         |    aggregate(sequence(1, length(d)), 0L, (t, i) -> t +
         |      (CASE WHEN i % 2 = 0 THEN
         |        (CASE WHEN (ascii(substr(reverse(d), i, 1)) - 48) * 2 > 9
         |         THEN (ascii(substr(reverse(d), i, 1)) - 48) * 2 - 9
         |         ELSE (ascii(substr(reverse(d), i, 1)) - 48) * 2 END)
         |       ELSE ascii(substr(reverse(d), i, 1)) - 48 END)) % 10 = 0
         |   THEN 1L ELSE 0L END))""".stripMargin
    df.select(col(idCol),
      expr(s"CAST(size($cands) AS BIGINT)").as("n_candidates"),
      expr(valid).as("n_luhn_valid"))
  }

  /** DuckDB rendering of [[cardScan]] over `(idExpr, textExpr)` rows
    * from `fromClause` — same regex, same fold.
    */
  def cardScanSql(fromClause: String, idExpr: String,
      textExpr: String): String = {
    val cands = s"regexp_extract_all($textExpr, '$cardPattern', 0)"
    s"""SELECT $idExpr AS id,
       |  CAST(len($cands) AS BIGINT) AS n_candidates,
       |  CAST(COALESCE(list_sum(list_transform(
       |    list_transform($cands, c -> regexp_replace(c, '[ -]', '', 'g')),
       |    d -> CASE WHEN length(d) BETWEEN 13 AND 19 AND
       |        list_sum(list_transform(range(1, length(d) + 1), i ->
       |          CASE WHEN i % 2 = 0 THEN
       |            (CASE WHEN (ascii(substr(reverse(d), i, 1)) - 48) * 2 > 9
       |             THEN (ascii(substr(reverse(d), i, 1)) - 48) * 2 - 9
       |             ELSE (ascii(substr(reverse(d), i, 1)) - 48) * 2 END)
       |           ELSE ascii(substr(reverse(d), i, 1)) - 48 END)) % 10 = 0
       |      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_luhn_valid
       |FROM $fromClause""".stripMargin
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
