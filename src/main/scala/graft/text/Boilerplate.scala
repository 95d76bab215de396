package graft.text

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal: drop every line that occurs in
  * at least `minDocs` distinct documents (navigation chrome, cookie
  * banners, "subscribe" footers — the CCNet/RefinedWeb line-dedup
  * step). The reference has no text pipeline; this extends SURVEY
  * §2.5's text-analysis category.
  *
  * 100 TB shape — two passes, no per-document shuffle:
  *   1. explode lines → `count(DISTINCT doc)` per line (map-side
  *      combined hash agg; the only shuffle, on the line value);
  *      lines clearing `minDocs` collapse to one small sorted array.
  *   2. a broadcast of that array joined onto every row, and a
  *      map-only HOF rewrite (`filter` + `array_join`) — no
  *      re-assembly `groupBy(doc)` shuffle of the full corpus text.
  * The frequent-line set is bounded by construction (each line must
  * appear in `minDocs`+ docs, so there are at most totalLines/minDocs
  * of them); `maxFreqLines` guards the broadcast against a degenerate
  * corpus — `assert_true` inside the broadcast value fails fast
  * rather than OOMing the driver, and cannot be pruned away because
  * it produces the value every row consumes. Unlike
  * [[graft.ops.Sampling.capPerGroup]] — whose group-count frame grows
  * with key cardinality and therefore takes a `broadcastCounts`
  * escape hatch — the broadcast here is a ONE-ROW frame whatever the
  * corpus size, so the forced hint is always safe.
  */
object Boilerplate {

  /** `(idCol, clean_text, n_removed)`: `textCol` with frequent lines
    * removed (single-character separator `sep`, preserved between
    * surviving lines) and the per-document count of removed lines.
    *
    * Note the input is evaluated twice (frequency pass + rewrite
    * pass); persist upstream lineage if it is expensive — the operator
    * does not cache on the caller's behalf.
    */
  def removeFrequentLines(
      df: DataFrame, idCol: String, textCol: String,
      sep: String, minDocs: Long, maxFreqLines: Int = 1000000,
  ): DataFrame = {
    require(sep.length == 1, s"sep must be a single character, got '$sep'")
    require(minDocs >= 2, s"minDocs $minDocs: a 1-doc 'boilerplate' line is just text")
    Seq("__freq_lines", "__lines", "__kept").foreach(c =>
      require(!df.columns.contains(c),
        s"removeFrequentLines reserves column name $c; rename it in the input"))
    val lines = split(col(textCol), Pattern.quote(sep))

    val freq = df
      .select(col(idCol).as("__doc"), explode(lines).as("__line"))
      .groupBy(col("__line"))
      .agg(countDistinct(col("__doc")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .agg(sort_array(collect_list(col("__line"))).as("__fl"),
        count(lit(1)).as("__n_freq"))
      .select(when(
        assert_true(col("__n_freq") <= maxFreqLines, concat(
          lit(s"boilerplate: frequent-line set exceeds maxFreqLines=$maxFreqLines ("),
          col("__n_freq"), lit(" lines)"))).isNull,
        col("__fl")).as("__freq_lines"))

    // project the lambda-HOF arrays ONCE: Spark CSE skips lambda trees,
    // so a repeated `filter(...)` expression would re-split and
    // re-filter per reference
    df.crossJoin(broadcast(freq))
      .withColumn("__lines", lines)
      .withColumn("__kept",
        filter(col("__lines"), l => !array_contains(col("__freq_lines"), l)))
      .select(
        col(idCol),
        array_join(col("__kept"), sep).as("clean_text"),
        (size(col("__lines")) - size(col("__kept"))).cast("int").as("n_removed"))
  }

  /** DuckDB rendering of [[removeFrequentLines]] over
    * `documents(doc_id, text)`: `whereClause` restricts the corpus
    * (applied to BOTH the frequency pass and the rewrite pass, like
    * the Spark side's single input frame), `sepSql` is a SQL string
    * literal for the separator, and `textExpr` lets the caller
    * construct the line-structured text. `coalesce(..., [])` covers
    * the zero-frequent-lines corpus, where DuckDB's `list()` over no
    * rows is NULL but Spark's `collect_list` is an empty array.
    */
  def removeFrequentLinesSql(
      sepSql: String, minDocs: Long, whereClause: String = "",
      textExpr: String = "text",
  ): String =
    s"""WITH src AS (SELECT doc_id, $textExpr AS text FROM documents $whereClause),
       |lines AS (SELECT doc_id, unnest(string_split(text, $sepSql)) AS line FROM src),
       |freq AS (SELECT coalesce(list(line ORDER BY line), []) AS fl FROM (
       |  SELECT line FROM lines GROUP BY line
       |  HAVING count(DISTINCT doc_id) >= $minDocs) f)
       |SELECT doc_id,
       |  array_to_string(list_filter(string_split(text, $sepSql),
       |    l -> NOT list_contains(fl, l)), $sepSql) AS clean_text,
       |  CAST(len(string_split(text, $sepSql))
       |    - len(list_filter(string_split(text, $sepSql),
       |        l -> NOT list_contains(fl, l))) AS INT) AS n_removed
       |FROM src, freq ORDER BY doc_id""".stripMargin
}
