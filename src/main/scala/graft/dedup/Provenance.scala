package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source duplication matrix — the provenance census a
  * curation team reads before setting mixture weights: for every
  * unordered source pair, how many distinct document fingerprints
  * appear in BOTH (mirror sites, syndicated feeds, and scraped
  * re-hosts show up as hot cells; a source that is mostly a subset
  * of another can be dropped from the mix wholesale instead of
  * paying per-document dedup against it).
  *
  * Shape: one md5-fingerprint + `(fingerprint, source)` distinct
  * (collapses every source's internal duplicates first, so a source
  * that repeats a template 10^6 times still contributes ONE row per
  * fingerprint), then a self-equi-join on the fingerprint with
  * `src_a < src_b` — the join's fan-out per fingerprint is
  * |sources carrying it|², bounded by the SOURCE count (tens), never
  * by document multiplicity; the matrix is ≤ |sources|² cells.
  * Text is projected away before anything shuffles.
  *
  * Output: `(src_a, src_b, n_shared)` for pairs sharing ≥ 1
  * fingerprint.
  */
object Provenance {

  def sourceOverlap(
      docs: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val fp = docs
      .filter(col(srcCol).isNotNull)
      .select(md5(col(textCol)).as("fp"), col(srcCol).as("src"))
      .distinct()
    fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** DuckDB rendering over `documents` with `textExpr` as the text
    * (the planted-duplicate device) restricted by `whereClause`.
    */
  def sourceOverlapSql(
      whereClause: String, textExpr: String = "text"): String = {
    val where =
      if (whereClause.trim.isEmpty) "WHERE source IS NOT NULL"
      else s"$whereClause AND source IS NOT NULL"
    s"""WITH fp AS (SELECT DISTINCT md5($textExpr) AS fp, source AS src
       |  FROM documents $where),
       |p AS (SELECT a.src AS src_a, b.src AS src_b FROM fp a
       |  JOIN fp b ON a.fp = b.fp AND a.src < b.src)
       |SELECT src_a, src_b, count(*) AS n_shared
       |FROM p GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin
  }
}
