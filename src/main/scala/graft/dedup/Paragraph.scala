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
    */
  def dedupFirstOccurrence(
      df: DataFrame, idCol: String, textCol: String, sep: String = "\n\n",
  ): DataFrame = {
    require(sep.nonEmpty, "sep must be non-empty")
    Seq("__pid", "__pidx", "__para", "__pkey", "__first", "__kept").foreach(c =>
      require(!df.columns.contains(c),
        s"dedupFirstOccurrence reserves column name $c; rename it in the input"))
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
    val kept = paras
      .join(first, Seq("__pkey"))
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

  /** DuckDB rendering of [[dedupFirstOccurrence]] over a source query
    * `srcSql` producing `(doc_id, text)`. `positionWidth` bounds
    * paragraphs per document (first-occurrence positions are encoded
    * as `doc_id * positionWidth + index` for the argmin — same
    * lexicographic order as the Spark struct-min for any corpus whose
    * documents stay under `positionWidth` paragraphs).
    */
  def dedupFirstOccurrenceSql(
      srcSql: String, sep: String, positionWidth: Long = 1000000L,
  ): String = {
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
       |  AND p.doc_id * $positionWidth + p.idx = f.first_pos)
       |SELECT d.doc_id, coalesce(string_agg(k.para, '$sepLit' ORDER BY k.idx), '') AS text
       |FROM d LEFT JOIN k ON d.doc_id = k.doc_id
       |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin
  }
}
