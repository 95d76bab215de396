package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML boilerplate removal for crawled corpora: strip markup tags and
  * decode the five predefined XML/HTML character entities. This is the
  * text-extraction step every web-scale pipeline runs before quality
  * scoring and dedup — tags would otherwise dominate shingles and
  * n-gram statistics.
  *
  * Scope is deliberately the REGULAR fragment of HTML: `<...>` spans
  * that contain no `>` (covers tags, comments-per-line, self-closing
  * forms) and the named entities `&amp; &lt; &gt; &quot; &#39;`.
  * Script/style CONTENT, CDATA, and multi-line comments need a real
  * parser and stay out of scope — at pipeline position this runs
  * after a DOM-level extractor; here it is the cheap in-engine pass.
  *
  * Cross-engine: the tag pattern `<[^>]*>` uses only a negated
  * single-character class — identical semantics in Java regex (Spark
  * codegen'd `regexp_replace`) and RE2 (DuckDB). Entity decoding is
  * plain `replace` chains; `&amp;` decodes LAST so a literal
  * `&amp;lt;` round-trips to `&lt;` and is not double-decoded (the
  * standard decode order, reverse of encoding).
  *
  * 100 TB shape: map-only, stays inside whole-stage codegen; no
  * shuffle, no UDF.
  */
object Html {

  /** Remove every `<...>` span (non-greedy by construction: `[^>]*`
    * cannot cross a closing bracket).
    */
  def stripTags(c: Column): Column = regexp_replace(c, "<[^>]*>", "")

  /** Decode the five predefined entities; `&amp;` last. */
  def decodeEntities(c: Column): Column = {
    val pairs = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&amp;" -> "&")
    pairs.foldLeft(c) { case (acc, (ent, ch)) =>
      replace(acc, lit(ent), lit(ch))
    }
  }

  /** [[stripTags]] then [[decodeEntities]] — the full extraction pass. */
  def extractText(c: Column): Column = decodeEntities(stripTags(c))

  /** DuckDB rendering of [[extractText]] applied to SQL expression
    * `e`: same tag regex, same replace chain, same order.
    */
  def extractTextSql(e: String): String = {
    val stripped = s"regexp_replace($e, '<[^>]*>', '', 'g')"
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "''",
      "&amp;" -> "&")
      .foldLeft(stripped) { case (acc, (ent, ch)) =>
        s"replace($acc, '$ent', '$ch')"
      }
  }
}
