package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4 cleaning rules (Raffel et al. 2020, §2.2 — the "Colossal Clean
  * Crawled Corpus" recipe, the other canonical published web-cleaning
  * pass next to the Gopher census ([[Repetition]]) and the CCNet
  * perplexity split ([[Lm.pplBuckets]])):
  *
  *   - LINE rule: keep only lines that end in a terminal punctuation
  *     mark (`.` `!` `?` `"`, after right-trim) AND contain at least
  *     5 words (library tokenizer rule);
  *   - PAGE rules over the CLEANED text: drop pages with fewer than
  *     3 sentences, pages containing `{` (code), and pages containing
  *     "lorem ipsum" (case-insensitive) — the page flags are reported
  *     individually so a pipeline can audit why a page dropped.
  *
  * (C4's bad-words blocklist page rule is corpus-policy, not
  * arithmetic — compose [[graft.dedup.Dedup.contaminationScan]] or a
  * broadcast blocklist anti-join for it; C4's 3-sentence span dedup
  * is the corpus-level dedup family's job.)
  *
  * Sentence counting here is the RAW `[.!?]+` run count over the
  * cleaned text (no floor — the 1-floor of
  * [[TextFunctions.sentenceCount]] exists for ratio features and
  * would mask the < 3 page rule).
  *
  * Output: `(idCol, n_lines, n_kept, cleaned_md5, n_sentences,
  * has_lorem, has_brace, keep)` — `cleaned_md5` digests the kept
  * lines rejoined with `\n` (the page a downstream writer would
  * emit). Everything is a per-row Column expression: map-only at any
  * scale, no shuffles, no UDFs.
  */
object C4 {

  /** The line keep rule as a reusable predicate over a line column.
    * The terminal-punctuation anchor is `[.!?"]\r?$` — the `\r?` is
    * load-bearing: lines come from a `\n` split, so CRLF text leaves
    * a trailing `\r` on every line, and Java's `$` matches BEFORE a
    * final `\r` while RE2's (DuckDB's) does not — without the
    * explicit `\r?` the two engines disagree on every CRLF document.
    */
  private def lineKeep(l: Column): Column =
    rtrim(l).rlike("[.!?\"]\r?$") &&
      size(TextFunctions.tokens(l)) >= 5

  /** Per-document C4 census + verdict; see object doc. */
  def c4Clean(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, lineKeep(_))
    val cleaned = array_join(kept, "\n")
    val nSentences =
      size(regexp_extract_all(cleaned, lit("[.!?]+"), lit(0))).cast("long")
    val hasLorem = lower(col(textCol)).contains("lorem ipsum")
    val hasBrace = col(textCol).contains("{")
    df.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      md5(cleaned).as("cleaned_md5"),
      nSentences.as("n_sentences"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (nSentences >= 3 && !hasLorem && !hasBrace).as("keep"))
  }

  /** DuckDB rendering of [[c4Clean]]; `from` is the source relation
    * exposing `(doc_id, text)` (a table name or a parenthesized
    * subquery for planted fixtures).
    */
  def c4CleanSql(whereClause: String, from: String = "documents"): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "l")
    // coalesce: DuckDB's array_to_string on an EMPTY list is NULL,
    // Spark's array_join is '' — the zero-kept-lines page must digest
    // and sentence-count the empty string on both engines
    val cleaned = "coalesce(array_to_string(kept, chr(10)), '')"
    s"""WITH d AS (SELECT doc_id, text,
       |    string_split(text, chr(10)) AS lines
       |  FROM $from $whereClause),
       |k AS (SELECT doc_id, text, lines,
       |    list_filter(lines, l -> regexp_matches(rtrim(l),
       |        '[.!?"]\\r?$$')
       |      AND len($toks) >= 5) AS kept
       |  FROM d)
       |SELECT doc_id,
       |  CAST(len(lines) AS BIGINT) AS n_lines,
       |  CAST(len(kept) AS BIGINT) AS n_kept,
       |  md5($cleaned) AS cleaned_md5,
       |  CAST(len(regexp_extract_all($cleaned, '[.!?]+', 0)) AS BIGINT)
       |    AS n_sentences,
       |  contains(lower(text), 'lorem ipsum') AS has_lorem,
       |  contains(text, '{') AS has_brace,
       |  (CAST(len(regexp_extract_all($cleaned, '[.!?]+', 0)) AS BIGINT) >= 3
       |    AND NOT contains(lower(text), 'lorem ipsum')
       |    AND NOT contains(text, '{')) AS keep
       |FROM k""".stripMargin
  }
}
