package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{QualityFilters, TextFunctions}

/** Corpus card — the per-source datasheet a data team publishes with
  * a training corpus (the "Datasheets for Datasets" practice, Gebru
  * et al. 2021, reduced to the numbers curation decisions actually
  * read): document and token inventory, language share, quality-rule
  * pass rate, and exact-duplicate rate, one row per source.
  *
  * All rates are exact integer parts-per-million (`div` == `//` on
  * non-negatives). The duplicate rate counts occurrences beyond each
  * fingerprint's first WITHIN the source (normalization-invariant
  * [[TextFunctions.fingerprint]]): cross-source duplication is
  * [[graft.dedup.Provenance]]'s matrix; near-duplication is the
  * MinHash family's census — this card is the cheap always-on
  * summary, not the dedup pass.
  *
  * 100 TB shape: one map-side projection computes every per-doc
  * signal (tokens, fingerprint, the 7 integer quality rules — all
  * codegen Column exprs), then ONE (source, fingerprint)-keyed hash
  * aggregation ([[signalCensus]] — map-side combinable) folded by a
  * source-keyed aggregation over one row per distinct fingerprint
  * ([[cardFromCensus]]). Text never shuffles; nothing broadcasts;
  * the census/fold split is exactly what the streaming door
  * maintains incrementally.
  */
object CorpusCard {

  /** The STREAMABLE core: one `(source, fingerprint)`-keyed
    * aggregation over the map-side signal projection —
    * `(source, __fp, __c, __nt, __en, __pass)`. This is the single
    * aggregation a Complete-mode stream can maintain (state = one
    * row per distinct fingerprint — EXACT, so this is the
    * small-corpus door; when exact dup state is too large,
    * [[sketchCensus]] is the implemented 100 TB form: bounded
    * per-source state, same fold shape); the batch card and the
    * stream door both fold it through [[cardFromCensus]], so
    * stream ≡ batch by construction.
    */
  def signalCensus(
      df: DataFrame, textCol: String, sourceCol: String, langCol: String,
      cfg: QualityFilters.Config = QualityFilters.Config(),
  ): DataFrame = {
    val flagged = QualityFilters.withRules(
      df.select(col(sourceCol).as("source"), col(langCol).as("lang"),
        col(textCol)),
      textCol, cfg)
    flagged.select(col("source"), col("lang"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("__nt"),
      TextFunctions.fingerprint(col(textCol)).as("__fp"),
      col("passes"))
      .groupBy(col("source"), col("__fp"))
      .agg(count(lit(1)).as("__c"),
        sum(col("__nt")).as("__nt"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("__en"),
        sum(when(col("passes"), 1L).otherwise(0L)).as("__pass"))
  }

  /** The 100 TB STREAMING core — the sketched census: ONE
    * `source`-keyed aggregation whose state is bounded per source
    * (four counters + a ≤`k`-entry KMV fingerprint sketch,
    * [[graft.functions.KmvSketch]] — dedup inside the O(k) buffer),
    * where [[signalCensus]] keeps one exact row per DISTINCT
    * fingerprint and therefore grows without bound in a Complete-mode
    * stream (billions of fingerprints at the corpus this card
    * describes). Everything except the duplicate term is exact —
    * `n_docs`/`total_tokens`/`en`/`pass` are plain counters; only
    * `dups = n_docs − distinct(fingerprint)` rides the sketch, with
    * the pinned KMV estimate contract ([[Sketches.kmvSketchEstimate]]:
    * EXACT when the sketch is underfull, `(k-1)/h_k` otherwise —
    * deterministic md5 arithmetic both engines compute identically,
    * so the sketched card hash-gates like the exact one). Keep
    * [[signalCensus]] as the small-corpus exact door.
    */
  def sketchCensus(
      df: DataFrame, textCol: String, sourceCol: String, langCol: String,
      k: Int, cfg: QualityFilters.Config = QualityFilters.Config(),
  ): DataFrame = {
    val flagged = QualityFilters.withRules(
      df.select(col(sourceCol).as("source"), col(langCol).as("lang"),
        col(textCol)),
      textCol, cfg)
    flagged.select(col("source"), col("lang"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("__nt"),
      TextFunctions.fingerprint(col(textCol)).as("__fp"),
      col("passes"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("total_tokens"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("__en"),
        sum(when(col("passes"), 1L).otherwise(0L)).as("__pass"),
        graft.functions.KmvSketch.kmv_sketch(
          Sketches.kmvHash(col("__fp")), k).as("__sk"))
  }

  /** Fold a [[sketchCensus]] (or its streamed Complete-mode snapshot)
    * to the sketched card: the exact columns fold exactly as
    * [[cardFromCensus]]; the dup term is
    * `n_docs − kmvSketchEstimate(sketch)` — clamped at 0 (the
    * estimator may overshoot `n_docs`), one multiply, one divide,
    * one floor, all IEEE-pinned against the oracle. Output:
    * `(source, n_docs, total_tokens, en_ppm, quality_pass_ppm,
    * fp_sketch_kept, fp_distinct_est, exact_dup_ppm_est)`.
    */
  def cardFromSketchCensus(census: DataFrame, k: Int): DataFrame = {
    val est = Sketches.kmvSketchEstimate(col("__sk"), k)
    val nd = col("n_docs").cast("double")
    census.select(col("source"), col("n_docs"), col("total_tokens"),
      expr("(__en * 1000000L) div n_docs").as("en_ppm"),
      expr("(__pass * 1000000L) div n_docs").as("quality_pass_ppm"),
      size(col("__sk")).as("fp_sketch_kept"),
      est.as("fp_distinct_est"),
      floor(greatest(lit(0.0), nd - est) * lit(1000000.0) / nd)
        .cast("long").as("exact_dup_ppm_est"))
  }

  /** DuckDB rendering of [[sketchCensus]] folded through
    * [[cardFromSketchCensus]]; same `from`/`whereClause` contract as
    * [[corpusCardSql]].
    */
  def sketchCardSql(
      k: Int, whereClause: String,
      cfg: QualityFilters.Config = QualityFilters.Config(),
      from: String = "documents",
  ): String = {
    def t(s: String): String = s.replace("TXT", "text")
    val toks = t(TextFunctions.tokensSql)
    val fp = t(TextFunctions.fingerprintSql)
    val passes = QualityFilters.rulesSql(cfg).map(r => t(r._2))
      .mkString("(", " AND ", ")")
    val (hi, _) = Sketches.kmvHashSql("fp")
    val est = Sketches.kmvSketchEstimateSql("n_kept", "kth_hi", k)
    s"""WITH f AS (SELECT source, lang,
       |    CAST(len($toks) AS BIGINT) AS nt,
       |    $fp AS fp,
       |    $passes AS passes
       |  FROM $from $whereClause),
       |a AS (SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(nt) AS BIGINT) AS total_tokens,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS en,
       |    CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS pass
       |  FROM f GROUP BY source),
       |d AS (SELECT DISTINCT source, $hi AS hi FROM f),
       |r AS (SELECT source, hi,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hi) AS rn
       |  FROM d),
       |sk AS (SELECT source, CAST(count(*) AS INT) AS n_kept,
       |    max(hi) AS kth_hi
       |  FROM r WHERE rn <= $k GROUP BY source),
       |e AS (SELECT source, n_kept, $est AS est FROM sk)
       |SELECT a.source, n_docs, total_tokens,
       |  CAST((en * 1000000) // n_docs AS BIGINT) AS en_ppm,
       |  CAST((pass * 1000000) // n_docs AS BIGINT) AS quality_pass_ppm,
       |  n_kept AS fp_sketch_kept,
       |  est AS fp_distinct_est,
       |  CAST(floor(greatest(0.0, CAST(n_docs AS DOUBLE) - est)
       |    * 1000000.0 / CAST(n_docs AS DOUBLE)) AS BIGINT)
       |    AS exact_dup_ppm_est
       |FROM a JOIN e USING (source)""".stripMargin
  }

  /** Merge per-shard censuses by RE-AGGREGATING on the
    * `(source, __fp)` key — a plain union would double-count rows
    * for a fingerprint that straddles shards and corrupt the
    * duplicate accounting (`Σ(c−1)` is not union-mergeable). The
    * streaming door never needs this: Complete-mode state already
    * keeps one row per key.
    */
  def mergeCensus(censuses: Seq[DataFrame]): DataFrame =
    censuses.reduce(_ unionByName _)
      .groupBy(col("source"), col("__fp"))
      .agg(sum(col("__c")).as("__c"), sum(col("__nt")).as("__nt"),
        sum(col("__en")).as("__en"), sum(col("__pass")).as("__pass"))

  /** Fold a [[signalCensus]] (or its streamed Complete-mode
    * snapshot, or a [[mergeCensus]] of shard censuses) to the card.
    * REQUIRES one row per `(source, __fp)` (what all three producers
    * guarantee): the duplicate accounting `Σ(c−1)` counts rows, so a
    * key split across rows would under-count duplicates.
    */
  def cardFromCensus(census: DataFrame): DataFrame =
    census
      .groupBy(col("source"))
      .agg(sum(col("__c")).as("n_docs"),
        sum(col("__nt")).as("total_tokens"),
        sum(col("__en")).as("__en"),
        sum(col("__pass")).as("__pass"),
        sum(col("__c") - 1L).as("__dups"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr("(__en * 1000000L) div n_docs").as("en_ppm"),
        expr("(__pass * 1000000L) div n_docs").as("quality_pass_ppm"),
        expr("(__dups * 1000000L) div n_docs").as("exact_dup_ppm"))

  /** One row per source: `(source, n_docs, total_tokens, en_ppm,
    * quality_pass_ppm, exact_dup_ppm)` — [[signalCensus]] folded
    * through [[cardFromCensus]].
    */
  def corpusCard(
      df: DataFrame, textCol: String, sourceCol: String, langCol: String,
      cfg: QualityFilters.Config = QualityFilters.Config(),
  ): DataFrame =
    cardFromCensus(signalCensus(df, textCol, sourceCol, langCol, cfg))

  /** DuckDB rendering of [[corpusCard]]; `from` is the source
    * relation exposing `(text, lang, source)` (a table name or a
    * parenthesized subquery for planted fixtures), restricted by
    * `whereClause`.
    */
  def corpusCardSql(
      whereClause: String,
      cfg: QualityFilters.Config = QualityFilters.Config(),
      from: String = "documents",
  ): String = {
    def t(s: String): String = s.replace("TXT", "text")
    val toks = t(TextFunctions.tokensSql)
    val fp = t(TextFunctions.fingerprintSql)
    val passes = QualityFilters.rulesSql(cfg).map(r => t(r._2))
      .mkString("(", " AND ", ")")
    s"""WITH f AS (SELECT source, lang,
       |    CAST(len($toks) AS BIGINT) AS nt,
       |    $fp AS fp,
       |    $passes AS passes
       |  FROM $from $whereClause),
       |fc AS (SELECT source, fp, count(*) AS c
       |  FROM f GROUP BY source, fp),
       |d AS (SELECT source, CAST(sum(c - 1) AS BIGINT) AS dups
       |  FROM fc GROUP BY source),
       |a AS (SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(nt) AS BIGINT) AS total_tokens,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS en,
       |    CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS pass
       |  FROM f GROUP BY source)
       |SELECT a.source, n_docs, total_tokens,
       |  CAST((en * 1000000) // n_docs AS BIGINT) AS en_ppm,
       |  CAST((pass * 1000000) // n_docs AS BIGINT) AS quality_pass_ppm,
       |  CAST((dups * 1000000) // n_docs AS BIGINT) AS exact_dup_ppm
       |FROM a JOIN d USING (source)""".stripMargin
  }
}
