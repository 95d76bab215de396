package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style hard quality RULES (Rae et al. 2021, §A1.1): unlike
  * the continuous [[TextFunctions.qualityScore]], each rule is a hard
  * pass/fail gate and a document must pass all of them — the form
  * corpus curation actually ships (C4, Gopher, RefinedWeb all filter,
  * not score). Every rule is exposed as its own boolean column so a
  * curation run can audit WHICH rule killed a document.
  *
  * All thresholds are rational (k-out-of-10 style) and every
  * comparison is ALL-INTEGER — `10·symbols <= words`, never
  * `symbols/words <= 0.1` — so the verdicts are engine-exact with no
  * float-division hinge. Map-only codegen: no shuffle, no UDF; regexes
  * stay in the Java ∩ RE2 portable subset (same discipline as
  * [[Pii]]).
  *
  * Rules (defaults = Gopher's published thresholds where they exist):
  *   - `r_words`:    minWords <= word count <= maxWords
  *   - `r_mean_len`: minMeanLen <= mean word length <= maxMeanLen
  *                   (as sumLen >= min·n && sumLen <= max·n)
  *   - `r_symbol`:   hash/ellipsis symbols <= maxSymbolPer10/10 of words
  *   - `r_bullet`:   lines starting with a bullet <= maxBulletPer10/10
  *   - `r_ellipsis`: lines ending in an ellipsis <= maxEllipsisPer10/10
  *   - `r_alpha`:    words containing a letter >= minAlphaPer10/10
  *   - `r_stop`:     at least minStopHits of the fixed stop list occur
  */
object QualityFilters {

  final case class Config(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Int = 3, maxMeanLen: Int = 10,
      maxSymbolPer10: Int = 1,
      maxBulletPer10: Int = 9,
      maxEllipsisPer10: Int = 3,
      minAlphaPer10: Int = 8,
      minStopHits: Int = 2,
  ) {
    require(minWords >= 0 && maxWords >= minWords, s"bad word bounds: $this")
    require(minMeanLen >= 0 && maxMeanLen >= minMeanLen, s"bad mean-len bounds: $this")
    Seq(maxSymbolPer10, maxBulletPer10, maxEllipsisPer10, minAlphaPer10)
      .foreach(k => require(k >= 0 && k <= 10, s"per-10 thresholds must be 0..10: $this"))
  }

  /** Gopher's stop list: a document with none of these is unlikely to
    * be running English prose.
    */
  val stopWords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The rule columns for a text column, in declaration order. */
  def rules(text: Column, cfg: Config = Config()): Seq[(String, Column)] = {
    val toks = TextFunctions.tokens(text)
    val nWords = size(toks).cast("long")
    // sum of word lengths: length of concatenated tokens (no separator)
    val sumLen = length(concat_ws("", toks)).cast("long")
    val nSymbols = regexp_count(text, lit("#|\\.\\.\\.")).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("long")
    val nEllipsis = size(filter(lines, l => rtrim(l).rlike("\\.\\.\\.$"))).cast("long")
    val nAlphaWords = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(
      array(stopWords.map(lit): _*),
      sw => array_contains(transform(toks, t => lower(t)), sw))).cast("long")
    Seq(
      "r_words" -> (nWords >= cfg.minWords && nWords <= cfg.maxWords),
      "r_mean_len" -> (sumLen >= lit(cfg.minMeanLen.toLong) * nWords &&
        sumLen <= lit(cfg.maxMeanLen.toLong) * nWords && nWords > 0),
      "r_symbol" -> (nSymbols * 10 <= nWords * cfg.maxSymbolPer10),
      "r_bullet" -> (nBullet * 10 <= nLines * cfg.maxBulletPer10),
      "r_ellipsis" -> (nEllipsis * 10 <= nLines * cfg.maxEllipsisPer10),
      "r_alpha" -> (nAlphaWords * 10 >= nWords * cfg.minAlphaPer10),
      "r_stop" -> (nStop >= cfg.minStopHits))
  }

  /** Input rows plus one boolean per rule and `passes` = AND of all. */
  def withRules(df: DataFrame, textCol: String, cfg: Config = Config()): DataFrame = {
    val rs = rules(col(textCol), cfg)
    (rs.map(_._1) :+ "passes").foreach(c =>
      require(!df.columns.contains(c),
        s"withRules reserves column name $c; rename it in the input"))
    val flagged = rs.foldLeft(df) { case (acc, (n, c)) => acc.withColumn(n, c) }
    flagged.withColumn("passes", rs.map(_._2).reduce(_ && _))
  }

  /** DuckDB rendering of [[rules]] — `TXT` is the text placeholder;
    * same names, same order, same integer arithmetic.
    */
  def rulesSql(cfg: Config = Config()): Seq[(String, String)] = {
    val toks = TextFunctions.tokensSql // TXT placeholder inside
    val nWords = s"CAST(len($toks) AS BIGINT)"
    val sumLen = s"CAST(length(list_aggregate($toks, 'string_agg', '')) AS BIGINT)"
    val nSymbols = s"CAST(len(regexp_extract_all(TXT, '#|\\.\\.\\.')) AS BIGINT)"
    val lines = "string_split(TXT, chr(10))"
    val nLines = s"CAST(len($lines) AS BIGINT)"
    val nBullet =
      s"CAST(len(list_filter($lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS BIGINT)"
    val nEllipsis =
      s"CAST(len(list_filter($lines, l -> regexp_matches(rtrim(l), '\\.\\.\\.$$'))) AS BIGINT)"
    val nAlphaWords =
      s"CAST(len(list_filter($toks, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)"
    val stopList = stopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    val nStop =
      s"CAST(len(list_filter($stopList, sw -> list_contains(list_transform($toks, t -> lower(t)), sw))) AS BIGINT)"
    Seq(
      "r_words" -> s"($nWords >= ${cfg.minWords} AND $nWords <= ${cfg.maxWords})",
      "r_mean_len" -> (s"($sumLen >= ${cfg.minMeanLen} * $nWords AND " +
        s"$sumLen <= ${cfg.maxMeanLen} * $nWords AND $nWords > 0)"),
      "r_symbol" -> s"($nSymbols * 10 <= $nWords * ${cfg.maxSymbolPer10})",
      "r_bullet" -> s"($nBullet * 10 <= $nLines * ${cfg.maxBulletPer10})",
      "r_ellipsis" -> s"($nEllipsis * 10 <= $nLines * ${cfg.maxEllipsisPer10})",
      "r_alpha" -> s"($nAlphaWords * 10 >= $nWords * ${cfg.minAlphaPer10})",
      "r_stop" -> s"($nStop >= ${cfg.minStopHits})")
  }
}
