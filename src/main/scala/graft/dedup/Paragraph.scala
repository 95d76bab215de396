package graft.dedup

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-level exact deduplication: every distinct paragraph keeps
  * only its FIRST occurrence in the corpus (lowest `(id, position)`);
  * later occurrences — in other documents or repeated within one — are
  * removed and the documents are reassembled from their surviving
  * paragraphs in original order.
  *
  * This is the repeated-paragraph removal used by large web-corpus
  * pipelines (C4 drops repeated three-sentence spans; RefinedWeb and
  * Dolma dedup at the paragraph/line level) — it targets boilerplate
  * and syndicated text that document-level dedup
  * ([[Dedup.minhashLshPairs]] etc.) cannot reach because the
  * *containing* documents are distinct. Complements
  * [[graft.text.Boilerplate.removeFrequentLines]]: that operator
  * removes high-frequency lines from EVERY document (frequency
  * threshold, all occurrences go); this one keeps exactly one
  * canonical occurrence of every paragraph regardless of frequency.
  *
  * 100 TB shape: paragraphs shuffle by `md5(paragraph)` — a fixed
  * 32-char key, so the canonical-position aggregation and the
  * membership join move digest-sized rows, not the text (the text
  * rides only the explode side of the join, never the aggregate). The
  * aggregation is map-side combinable (`min` of a struct). A
  * pathologically frequent paragraph (the classic skew risk) is
  * harmless here: the canonical side is one row per DISTINCT
  * paragraph, so the hot key streams through the join without row
  * amplification, and AQE's skew-join split handles reducer balance.
  * The final per-document reassembly shuffles by document id —
  * paragraphs of a document are collected and sorted in memory, which
  * bounds per-group state by the largest single document, not the
  * corpus.
  */
object Paragraph {

  /** Dedup `textCol` of `df` at paragraph granularity (paragraphs =
    * `sep`-separated spans, `sep` taken literally). Returns
    * `(idCol, textCol)` with one row per input row; a document whose
    * every paragraph occurred earlier comes back as the empty string.
    *
    * First-occurrence order is `(id, position)` lexicographically, so
    * ids must be orderable and the result is deterministic for any
    * partitioning. Empty paragraphs dedup like any other (split
    * preserves them); the first empty span survives, the rest vanish.
    *
    * Contract: `idCol` values must be UNIQUE — the ordering contract
    * already assumes ids identify rows. With duplicate ids the rebuild
    * groupBy merges the duplicates' surviving paragraphs into one text
    * and attaches it to every duplicate row (and a SQL rendering would
    * collapse them to one row), so the "one row per input row" shape
    * silently breaks. Callers with non-unique keys should
    * `monotonically_increasing_id()` first.
    */
  def dedupFirstOccurrence(
      df: DataFrame, idCol: String, textCol: String, sep: String = "\n\n",
  ): DataFrame = {
    require(sep.nonEmpty, "sep must be non-empty")
    Seq("__pid", "__pidx", "__para", "__pkey", "__first", "__kept").foreach(c =>
      require(!df.columns.contains(c),
        s"dedupFirstOccurrence reserves column name $c; rename it in the input"))
    val kept = joinedParagraphs(df, idCol, textCol, sep)
      .filter(struct(col("__pid"), col("__pidx")) === col("__first"))
    val rebuilt = kept
      .groupBy(col("__pid"))
      .agg(concat_ws(sep,
        transform(
          array_sort(collect_list(struct(col("__pidx"), col("__para")))),
          x => x.getField("__para"))).as("__kept"))
    // left join back so fully-deduplicated documents survive as ''
    df.select(col(idCol).as("__pid"))
      .join(rebuilt, Seq("__pid"), "left")
      .select(col("__pid").as(idCol),
        coalesce(col("__kept"), lit("")).as(textCol))
  }

  /** The exploded paragraphs joined to their canonical (first)
    * position — [[dedupFirstOccurrence]]'s pre-filter join, exposed so
    * ParagraphSpec can instrument its volume: the canonical side holds
    * exactly ONE row per DISTINCT paragraph, so the join is 1:1 with
    * the exploded input (output rows == `Σ paragraphs(doc)`) even when
    * one paragraph occurs in every document — the skew case that would
    * amplify quadratically in a frequency-keyed design.
    */
  private[graft] def joinedParagraphs(
      df: DataFrame, idCol: String, textCol: String, sep: String,
  ): DataFrame = {
    val paras = df
      .select(col(idCol).as("__pid"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("__pidx", "__para")))
      .withColumn("__pkey", md5(col("__para")))
    // canonical (first) position per distinct paragraph: digest-keyed,
    // map-side combinable, one output row per distinct paragraph
    val first = paras
      .groupBy(col("__pkey"))
      .agg(min(struct(col("__pid"), col("__pidx"))).as("__first"))
    paras.join(first, Seq("__pkey"))
  }

  /** DuckDB rendering of [[dedupFirstOccurrence]] over a source query
    * `srcSql` producing `(doc_id, text)`. `positionWidth` bounds
    * paragraphs per document (first-occurrence positions are encoded
    * as `doc_id * positionWidth + index` for the argmin — same
    * lexicographic order as the Spark struct-min ONLY while three
    * contracts hold, which the generated SQL enforces with a runtime
    * `error()` guard CTE:
    *   - every document has fewer than `positionWidth` paragraphs
    *     (an index ≥ width would bleed into the next id's range);
    *   - `doc_id >= 0` (a negative id flips the encoded order);
    *   - `max(doc_id) * positionWidth + positionWidth` fits in BIGINT
    *     (overflow would wrap the argmin key).
    * Outside those bounds the two engines would silently pick
    * different canonical occurrences; the guard turns silence into a
    * query error.
    */
  def dedupFirstOccurrenceSql(
      srcSql: String, sep: String, positionWidth: Long = 1000000L,
  ): String = {
    require(positionWidth > 0, "positionWidth must be positive")
    val sepLit = sep.replace("'", "''")
    s"""WITH d AS ($srcSql),
       |s AS (SELECT doc_id, string_split(text, '$sepLit') AS ps FROM d),
       |p AS (SELECT doc_id, i AS idx, ps[i] AS para
       |  FROM s, unnest(range(1, len(ps) + 1)) AS t(i)),
       |f AS (SELECT md5(para) AS pkey,
       |    min(doc_id * $positionWidth + idx) AS first_pos
       |  FROM p GROUP BY 1),
       |k AS (SELECT doc_id, idx, para FROM p JOIN f
       |  ON md5(p.para) = f.pkey
       |  AND p.doc_id * $positionWidth + p.idx = f.first_pos),
       |g AS (SELECT CASE
       |    WHEN max(idx) >= $positionWidth
       |      THEN error('paragraph index exceeds positionWidth')
       |    WHEN min(doc_id) < 0 THEN error('doc_id must be non-negative')
       |    WHEN max(doc_id) > (9223372036854775807 - $positionWidth) / $positionWidth
       |      THEN error('doc_id * positionWidth overflows BIGINT')
       |    ELSE TRUE END AS ok FROM p)
       |SELECT d.doc_id, coalesce(string_agg(k.para, '$sepLit' ORDER BY k.idx), '') AS text
       |FROM d LEFT JOIN k ON d.doc_id = k.doc_id, g
       |WHERE g.ok GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }
}
