package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: language
  * identification, quality scoring, token counting, and document
  * fingerprinting. All are pure per-row `Column` expressions
  * (codegen'd, no UDFs, no shuffles) — at 100 TB they run entirely
  * map-side inside whole-stage codegen.
  *
  * Every function has a semantically identical ANSI-SQL rendering used
  * by the DuckDB oracle (see companion `*Sql` members); arithmetic is
  * ordered identically on both sides so doubles match bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  val tokensSql: String =
    "list_filter(string_split_regex(trim(TXT), '\\s+'), t -> t <> '')"

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, single digits, single
    * punctuation — a cheap regex proxy for byte-pair tokenizers.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Marker function words per language, used by the n-gram/stopword
    * heuristic [[langId]]. Order fixes the arg-max tie-break.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ich", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est"),
    "es" -> Seq("el", "los", "las", "y", "que", "en", "se", "por"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"),
  )

  /** Count of tokens that are marker words of `lang`. */
  def langScore(text: Column, lang: String): Column = {
    val markers = langMarkers.find(_._1 == lang).get._2
    size(filter(tokens(lower(text)), t => t.isInCollection(markers)))
  }

  def langScoreSql(lang: String): String = {
    val markers = langMarkers.find(_._1 == lang).get._2
      .map(m => s"'$m'").mkString(", ")
    s"len(list_filter(${tokensSql.replace("TXT", "lower(TXT)")}, t -> list_contains([$markers], t)))"
  }

  /** Heuristic language id: arg-max marker-word count, first language
    * in [[langMarkers]] order wins ties, 'und' when no marker hits.
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(text, l) }
    val total = scores.map(_._2).reduce(_ + _)
    // arg-max chain: first max in declaration order
    val argmax = scores.zipWithIndex.foldRight(lit("und")) {
      case (((l, s), i), elseExpr) =>
        val isMax = scores.zipWithIndex
          .filter(_._2 != i)
          .map { case ((_, s2), j) => if (j < i) s > s2 else s >= s2 }
          .reduce(_ && _)
        when(isMax, lit(l)).otherwise(elseExpr)
    }
    when(total === 0, lit("und")).otherwise(argmax)
  }

  def langIdSql: String = {
    val ss = langMarkers.map { case (l, _) => l -> langScoreSql(l) }
    val total = ss.map(_._2).mkString(" + ")
    val branches = ss.zipWithIndex.map { case ((l, s), i) =>
      val conds = ss.zipWithIndex.filter(_._2 != i).map { case ((_, s2), j) =>
        if (j < i) s"$s > $s2" else s"$s >= $s2"
      }
      s"WHEN ${conds.mkString(" AND ")} THEN '$l'"
    }
    s"CASE WHEN ($total) = 0 THEN 'und' ${branches.mkString(" ")} ELSE 'und' END"
  }

  /** Quality score in [0,1]: length factor, stopword-density factor,
    * alphabetic-character ratio. Same op order as [[qualityScoreSql]].
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok, lit(200.0)) / lit(200.0)
    val stopRatio = when(nTok === 0, lit(0.0))
      .otherwise(langScore(text, "en").cast("double") / nTok)
    val stopScore = least(stopRatio * lit(5.0), lit(1.0))
    val alphaRatio = when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
        length(text).cast("double"))
    round(lit(0.4) * lenScore + lit(0.3) * stopScore + lit(0.3) * alphaRatio, 6)
  }

  def qualityScoreSql: String = {
    val nTok = s"CAST(len(${tokensSql}) AS DOUBLE)"
    val en = langScoreSql("en")
    s"round(0.4 * (least($nTok, 200.0) / 200.0) " +
      s"+ 0.3 * least((CASE WHEN $nTok = 0 THEN 0.0 ELSE CAST($en AS DOUBLE) / $nTok END) * 5.0, 1.0) " +
      s"+ 0.3 * (CASE WHEN length(TXT) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(TXT, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(length(TXT) AS DOUBLE) END), 6)"
  }

  /** Normalization-invariant document fingerprint: md5 of lower-cased,
    * whitespace-collapsed text. Identical rows at 100 TB dedup with a
    * single hash-shuffle on this value.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  val fingerprintSql: String =
    "md5(regexp_replace(lower(trim(TXT)), '\\s+', ' ', 'g'))"

  /** All word `n`-grams of a token array, duplicates KEPT — the
    * multiset the repetition signal needs;
    * [[graft.dedup.Dedup.wordShinglesOf]] wraps this in
    * `array_distinct` for the set-similarity operators (ONE shared
    * fold, kept in sync by construction).
    *
    * Construction: fold `zip_with(acc, slice(toks, k+1, len), concat)`
    * for k = 1..n-1 — each shifted slice is evaluated ONCE per row as
    * a zip_with argument; no expression is captured inside a lambda,
    * so this is O(n · tokens) per document regardless of what `toks`
    * expands to. (A windowing `transform` that slices `toks` inside
    * its lambda re-evaluates the captured expression per element —
    * Spark HOFs do no caching — which is O(tokens²) per document when
    * `toks` is itself the tokenizer.) zip_with null-pads the shorter
    * side, so windows past the end become null and are filtered;
    * documents with fewer than n tokens yield empty arrays.
    */
  def allGramsOf(toks: Column, n: Int): Column = {
    require(n >= 1, s"n $n must be >= 1")
    val joined = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), size(toks)),
        (a, b) => concat(a, lit(" "), b))
    }
    filter(joined, s => s.isNotNull)
  }

  /** Within-document repetition: fraction of word `n`-gram
    * OCCURRENCES that are repeats of an earlier occurrence —
    * `1 − distinct/total` over the n-gram multiset (the
    * boilerplate/spam signal behind Gopher-style repetition filters;
    * templated and keyword-stuffed pages score high, clean prose
    * scores near 0). Documents with fewer than `n` tokens score 0.
    * Pure per-row Column expression, map-only at any scale; exact
    * double arithmetic in identical order on both engines
    * ([[repetitionScoreSql]]).
    *
    * Convenience form — it references the gram build three times and
    * lambda-bearing HOF trees are excluded from Spark's
    * subexpression elimination, so the tokenizer+fold re-runs per
    * reference. In queries (or when scoring several `n` over one
    * document), PROJECT the token/gram arrays as columns first and
    * use [[repetitionScoreOf]] — the same project-the-array-first
    * rule as [[graft.dedup.Dedup.wordShinglesOf]].
    */
  def repetitionScore(text: Column, n: Int): Column =
    repetitionScoreOf(allGramsOf(tokens(text), n))

  /** [[repetitionScore]] over an already-projected gram multiset
    * column (see [[allGramsOf]]).
    */
  def repetitionScoreOf(grams: Column): Column =
    when(size(grams) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(grams)).cast("double") /
          size(grams).cast("double"))

  /** DuckDB rendering of [[allGramsOf]] (duplicates kept); `toks` is
    * a SQL expression for the token list — compute it once in a CTE,
    * it is referenced `n + 1` times here.
    */
  def allGramsSql(toks: String, n: Int): String = {
    require(n >= 1, s"n $n must be >= 1")
    val gram = (0 until n).map(k => s"$toks[i + $k]").mkString(" || ' ' || ")
    s"list_transform(range(1, greatest(len($toks) - ${n - 1}, 0) + 1), i -> $gram)"
  }

  /** DuckDB rendering of [[repetitionScore]]; `toks` is a SQL
    * expression for the token list (compute it once in a CTE — it is
    * referenced `n + 2` times here).
    */
  def repetitionScoreSql(toks: String, n: Int): String = {
    val grams = allGramsSql(toks, n)
    s"(CASE WHEN len($grams) = 0 THEN 0.0 ELSE " +
      s"1.0 - CAST(len(list_distinct($grams)) AS DOUBLE) / CAST(len($grams) AS DOUBLE) END)"
  }

  /** Sentence count: runs of `[.!?]` (floored at 1 so ratio features
    * stay defined for fragments).
    */
  def sentenceCount(text: Column): Column =
    greatest(lit(1), size(regexp_extract_all(text, lit("[.!?]+"), lit(0))))

  /** Syllable proxy: vowel-group count (`[aeiouy]+` runs in the
    * lowercased text), floored at the word count — every word has at
    * least one syllable. The standard cheap proxy; exact
    * syllabification needs a dictionary.
    */
  def syllableProxy(text: Column): Column =
    greatest(tokenCount(text),
      size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0))))

  /** Flesch Reading Ease from the integer censuses:
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)` in
    * exactly that IEEE op order (constants shortest-round-trip
    * rendered in [[fleschSql]]) — the classic readability quality
    * signal (very low scores flag jargon/boilerplate; implausibly
    * high ones flag listicles/fragments). Null when the document has
    * no words.
    */
  def flesch(text: Column): Column = {
    val w = tokenCount(text).cast("double")
    val s = sentenceCount(text).cast("double")
    val syl = syllableProxy(text).cast("double")
    when(w > 0,
      lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (syl / w))
  }

  /** DuckDB renderings of the readability censuses and score for a
    * text expression `t` (op order identical to [[flesch]]).
    */
  def sentenceCountSql(t: String): String =
    s"greatest(1, len(regexp_extract_all($t, '[.!?]+', 0)))"

  def syllableProxySql(t: String): String =
    s"greatest(len(${tokensSql.replace("TXT", t)}), " +
      s"len(regexp_extract_all(lower($t), '[aeiouy]+', 0)))"

  def fleschSql(t: String): String = {
    val w = s"CAST(len(${tokensSql.replace("TXT", t)}) AS DOUBLE)"
    s"""CASE WHEN $w > 0 THEN 206.835
       | - 1.015 * ($w / CAST(${sentenceCountSql(t)} AS DOUBLE))
       | - 84.6 * (CAST(${syllableProxySql(t)} AS DOUBLE) / $w)
       | END""".stripMargin.replace("\n", "")
  }

  /** Letter-distribution concentration — a LOG-FREE entropy stand-in
    * for gibberish/keyboard-mash detection (natural prose spreads mass
    * over many letters; `aaaa…`/base64 blobs concentrate it). Reports
    * the Gini impurity of the a–z letter histogram in integer parts
    * per million: `gini_ppm = 1e6 · (N² − Σcᵢ²) / N²` (floored) —
    * near 0 = single-letter degenerate, English prose ≈ 930,000.
    * Entirely integer arithmetic (the Gini's Σp² needs no logarithm —
    * the same transcendental-free trick as the PMI-lift collocations),
    * so the oracle matches bit-for-bit.
    *
    * Shape: map-only, NO explode — the 26 per-letter counts come from
    * `length(t) − length(replace(t, letter))` inside one projected
    * array, folded to (N, Σc²) in a single `aggregate` pass; stays in
    * whole-stage codegen. Counts only `[a-z]` after lowercasing:
    * portable across engines (no unicode-class divergence) and
    * scale-free in the alphabet.
    */
  private val letterCountsExpr =
    "transform(sequence(0, 25), i -> cast(length(__low) - " +
      "length(replace(__low, char(i + 97))) as bigint))"

  def letterConcentration(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
  ): org.apache.spark.sql.DataFrame = {
    require(!df.columns.contains("__low"),
      "letterConcentration reserves column name __low; rename it")
    df.withColumn("__low", lower(col(textCol)))
      .withColumn("__ns", expr(
        s"aggregate($letterCountsExpr, named_struct('n', 0L, 's', 0L), " +
          "(a, x) -> named_struct('n', a.n + x, 's', a.s + x * x))"))
      .select(col(idCol),
        col("__ns.n").as("n_letters"),
        // upper guard: (n² − s)·1e6 exceeds Long past ~3.04M letters,
        // where Spark (non-ANSI) would wrap silently while DuckDB
        // raises — null the score instead, identically in both
        // engines (chunk pathological documents first)
        when(col("__ns.n") > 0 && col("__ns.n") <= 3000000L,
          expr("((__ns.n * __ns.n - __ns.s) * 1000000L) div (__ns.n * __ns.n)"))
          .as("gini_ppm"))
  }

  /** DuckDB rendering of [[letterConcentration]]'s per-row censuses
    * for a text expression `t`: `(n_letters, sum_sq)` as two exprs.
    */
  def letterCensusSql(t: String): (String, String) = {
    val counts = s"list_transform(range(0, 26), i -> " +
      s"len(lower($t)) - len(replace(lower($t), " +
      s"chr(CAST(i + 97 AS INTEGER)), '')))"
    (s"CAST(list_sum($counts) AS BIGINT)",
      s"CAST(list_sum(list_transform($counts, x -> x * x)) AS BIGINT)")
  }
}
