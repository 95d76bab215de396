package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style within-document repetition signals (Rae et al. 2021,
  * appendix A1.1 — the filter set behind MassiveText and most
  * web-corpus curation since): templated/spammy pages repeat lines
  * and n-grams, clean prose does not. One representative signal per
  * class, each an exact integer part-per-million fraction:
  *
  *   - `dup_line_ppm`       line OCCURRENCES beyond their first / lines
  *   - `dup_line_char_ppm`  characters in those repeat occurrences /
  *                          characters across all lines
  *   - `top_gram_char_ppm`  characters covered by the single most
  *                          frequent word `topN`-gram (count × gram
  *                          chars) / normalized document characters
  *   - `dup_gram_char_ppm`  characters covered by ALL occurrences of
  *                          duplicated word `dupN`-grams / normalized
  *                          document characters
  *
  * Exact rules (documented because published reimplementations vary):
  * lines split on `\n` and compared verbatim (case kept); grams come
  * from the library tokenizer (lowercased, whitespace-split,
  * [[TextFunctions.allGramsOf]]); the gram-fraction denominator is
  * the space-normalized character count `len(join(tokens, ' '))`;
  * the top gram breaks count ties on the lexicographically smallest
  * gram; duplicated-gram coverage counts every occurrence including
  * the first (a gram seen twice is wholly boilerplate). Fractions
  * with a zero denominator report 0. All ratios are BIGINT
  * `(num * 1e6) div den` — engine-exact (both operands non-negative,
  * so Spark's truncating `div` and DuckDB's flooring `//` agree).
  *
  * Gopher's paper thresholds for reference: drop when duplicate-line
  * fraction > 0.30, duplicate-line character fraction > 0.20, top
  * 2-gram character fraction > 0.20, duplicate 5-gram character
  * fraction > 0.10 (Rae et al. 2021, Table A1) — thresholds are the
  * caller's dial; this operator reports the census.
  *
  * 100 TB shape: text explodes map-side to `(id, line)` / `(id, gram)`
  * with the payload projected away before any shuffle; each census is
  * a two-level hash aggregate (partial map-side combine on the
  * (id, key) pair, then a per-id fold), and the three framelets
  * re-join on the id — every shuffle is id- or (id,key)-hashed,
  * nothing global, nothing broadcast.
  */
object Repetition {

  /** The per-document repetition census: `(idCol, n_lines,
    * dup_line_ppm, dup_line_char_ppm, top_gram_char_ppm,
    * dup_gram_char_ppm)`. See object doc for the exact rules.
    */
  def gopherRepetition(
      df: DataFrame, idCol: String, textCol: String,
      topN: Int = 2, dupN: Int = 5,
  ): DataFrame = {
    require(topN >= 1, s"topN $topN must be >= 1")
    require(dupN >= 1, s"dupN $dupN must be >= 1")
    val base = df.select(col(idCol),
      TextFunctions.tokens(lower(col(textCol))).as("__toks"),
      split(col(textCol), "\n").as("__lines"))

    val docs = base.select(col(idCol),
      length(concat_ws(" ", col("__toks"))).cast("long").as("__tok_chars"))

    val lineStats = base
      .select(col(idCol), explode(col("__lines")).as("__line"))
      .groupBy(col(idCol), col("__line"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("__n_lines"),
        sum(length(col("__line")).cast("long") * col("__c"))
          .as("__line_chars"),
        sum(col("__c") - 1L).as("__dup_lines"),
        sum(length(col("__line")).cast("long") * (col("__c") - 1L))
          .as("__dup_line_chars"))

    def gramCounts(n: Int): DataFrame = base
      .select(col(idCol),
        explode(TextFunctions.allGramsOf(col("__toks"), n)).as("__g"))
      .groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))

    val topStats = gramCounts(topN)
      .groupBy(col(idCol))
      .agg(min(struct((lit(0L) - col("__c")).as("nc"), col("__g").as("g")))
        .as("__top"))
      .select(col(idCol),
        ((lit(0L) - col("__top.nc")) * length(col("__top.g")).cast("long"))
          .as("__top_gram_chars"))

    val dupStats = gramCounts(dupN)
      .groupBy(col(idCol))
      .agg(sum(when(col("__c") > 1L,
          col("__c") * length(col("__g")).cast("long")).otherwise(0L))
        .as("__dup_gram_chars"))

    docs
      .join(lineStats, Seq(idCol), "left")
      .join(topStats, Seq(idCol), "left")
      .join(dupStats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n_lines"), lit(0L)).as("n_lines"),
        ppmExpr("__dup_lines", "__n_lines").as("dup_line_ppm"),
        ppmExpr("__dup_line_chars", "__line_chars").as("dup_line_char_ppm"),
        ppmExpr("__top_gram_chars", "__tok_chars").as("top_gram_char_ppm"),
        ppmExpr("__dup_gram_chars", "__tok_chars").as("dup_gram_char_ppm"))
  }

  /** `(num * 1e6) div den` with null→0 and zero-denominator→0 — the
    * shared exact-ppm rule (both engines floor non-negatives).
    */
  private def ppmExpr(numCol: String, denCol: String): Column =
    expr(s"CASE WHEN coalesce($denCol, 0L) > 0L THEN " +
      s"(coalesce($numCol, 0L) * 1000000L) div $denCol ELSE 0L END")

  /** DuckDB rendering of [[gopherRepetition]] — same splits, same
    * censuses, same integer ppm arithmetic. `from` is the source
    * relation (`documents`, or a parenthesized subquery exposing
    * `(doc_id, text)` for planted fixtures).
    */
  def gopherRepetitionSql(
      whereClause: String, topN: Int = 2, dupN: Int = 5,
      from: String = "documents",
  ): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val topGrams = TextFunctions.allGramsSql("toks", topN)
    val dupGrams = TextFunctions.allGramsSql("toks", dupN)
    def ppm(num: String, den: String): String =
      s"CAST(CASE WHEN coalesce($den, 0) > 0 THEN " +
        s"(coalesce($num, 0) * 1000000) // $den ELSE 0 END AS BIGINT)"
    s"""WITH d AS (SELECT doc_id, $toks AS toks,
       |    string_split(text, chr(10)) AS lines
       |  FROM $from $whereClause),
       |dc AS (SELECT doc_id,
       |    CAST(length(array_to_string(toks, ' ')) AS BIGINT) AS tok_chars
       |  FROM d),
       |lc AS (SELECT doc_id, line, count(*) AS c
       |  FROM (SELECT doc_id, unnest(lines) AS line FROM d)
       |  GROUP BY doc_id, line),
       |ls AS (SELECT doc_id, sum(c) AS n_lines,
       |    sum(length(line) * c) AS line_chars,
       |    sum(c - 1) AS dup_lines,
       |    sum(length(line) * (c - 1)) AS dup_line_chars
       |  FROM lc GROUP BY doc_id),
       |gt AS (SELECT doc_id, g, count(*) AS c
       |  FROM (SELECT doc_id, unnest($topGrams) AS g FROM d)
       |  GROUP BY doc_id, g),
       |ts AS (SELECT doc_id, c * length(g) AS top_gram_chars
       |  FROM (SELECT doc_id, g, c,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g)
       |        AS rn FROM gt)
       |  WHERE rn = 1),
       |gd AS (SELECT doc_id, g, count(*) AS c
       |  FROM (SELECT doc_id, unnest($dupGrams) AS g FROM d)
       |  GROUP BY doc_id, g),
       |ds AS (SELECT doc_id,
       |    sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END)
       |      AS dup_gram_chars
       |  FROM gd GROUP BY doc_id)
       |SELECT dc.doc_id,
       |  CAST(coalesce(ls.n_lines, 0) AS BIGINT) AS n_lines,
       |  ${ppm("ls.dup_lines", "ls.n_lines")} AS dup_line_ppm,
       |  ${ppm("ls.dup_line_chars", "ls.line_chars")} AS dup_line_char_ppm,
       |  ${ppm("ts.top_gram_chars", "dc.tok_chars")} AS top_gram_char_ppm,
       |  ${ppm("ds.dup_gram_chars", "dc.tok_chars")} AS dup_gram_char_ppm
       |FROM dc
       |LEFT JOIN ls USING (doc_id)
       |LEFT JOIN ts USING (doc_id)
       |LEFT JOIN ds USING (doc_id)""".stripMargin
  }
}
