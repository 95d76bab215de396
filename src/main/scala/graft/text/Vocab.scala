package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary census: the top-k tokens by corpus frequency with
  * their document frequencies — the first pass of tokenizer training
  * (BPE seed vocab), stopword-list construction, and domain-shift
  * checks between corpus versions. The reference has no text pipeline;
  * this extends SURVEY §2.5's text-analysis category.
  *
  * 100 TB shape: tokenize/explode is map-only; the frequency aggregate
  * shuffles once on the token value with map-side combine (vocabulary-
  * sized reducers, and natural-language token frequencies are Zipfian —
  * the hot "the" key still combines map-side, so no reducer sees the
  * raw corpus volume); the final top-k plans as TakeOrderedAndProject —
  * a per-partition heap of k rows merged on the driver, NOT a global
  * sort and never a single-partition window. Keep k bounded (it is a
  * driver-merged result); for a full vocabulary dump, drop the limit
  * and write the aggregate directly.
  */
object Vocab {

  /** Top `k` tokens (lowercased, whitespace-split — the
    * [[TextFunctions.tokens]] definition) by corpus frequency.
    * Output: `(term, n_total, n_docs)`, ordered by `n_total` desc with
    * the term as a total tie-break, so the cut is deterministic.
    */
  def topTokens(
      df: DataFrame, idCol: String, textCol: String, k: Int,
  ): DataFrame = {
    require(k > 0, s"k $k must be positive")
    df.select(col(idCol).as("__doc"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("__doc")).as("n_docs"))
      .orderBy(col("n_total").desc, col("term"))
      .limit(k)
  }

  /** DuckDB rendering of [[topTokens]] over `documents(doc_id, text)`
    * restricted by `whereClause` (a full `WHERE ...` clause or "").
    */
  def topTokensSql(k: Int, whereClause: String): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""WITH t AS (SELECT doc_id, unnest($toks) AS term
       |  FROM documents $whereClause),
       |v AS (SELECT term, CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       |  FROM t GROUP BY 1)
       |SELECT term, n_total, n_docs FROM v
       |ORDER BY n_total DESC, term LIMIT $k""".stripMargin
  }

  /** Token-id encoding against a ranked vocabulary: every token of
    * every document becomes its 1-based RANK in the vocabulary
    * (corpus count desc, term asc — [[topTokens]]' deterministic
    * order), with 0 as the out-of-vocabulary id — the text→ids step
    * that turns a curated corpus into tokenizer-ready training rows.
    * Output is FLATTENED: `(idCol, pos, token_id)`, one row per token
    * occurrence with its 0-based position (downstream packing/writer
    * stages consume exactly this shape; empty documents produce no
    * rows).
    *
    * 100 TB shape: the vocabulary is a DIMENSION TABLE — each token
    * occurrence resolves its rank through a broadcast HASH join
    * (`BroadcastHashJoin`, whole-stage codegen, O(1) probe), not a
    * per-token scan of a broadcast collection. This matters more than
    * it looks: a broadcast `array_position` is the obvious O(k) scan,
    * and the tempting "broadcast a term->rank map and `element_at`"
    * fix is a TRAP — Catalyst's `MapData` is array-backed with no
    * hash index, so `element_at`/`GetMapValue` is ALSO an O(k) linear
    * scan (and interpreted, upstream of codegen). At tokenizer-scale
    * vocabularies (32k–256k terms × ~1k tokens/doc) the scan is
    * 10⁷–10⁸ key compares per document; the hash probe is ~10× faster
    * at k=32k locally and grows its lead linearly in k (SCALE.md).
    * No shuffle touches the corpus — the explode multiplies rows by
    * tokens-per-document (the output's intrinsic size) and the join
    * side ships one bounded vocab copy per executor.
    *
    * Duplicate terms in `vocab` keep their best (lowest) rank and
    * cannot multiply output rows — the join side is min-aggregated
    * per term, preserving `array_position` first-match semantics.
    */
  def encode(
      df: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      termCol: String = "term", countCol: String = "n_total",
  ): DataFrame = {
    Seq("__vs", "__vocab", "__term", "__rank", "__toks", "pos", "token_id")
      .foreach(c => require(!df.columns.contains(c),
        s"encode reserves column name $c; rename it in the input"))
    val rankedTerms = rankedVocabArray(vocab, termCol, countCol)
      .select(posexplode(col("__vocab")).as(Seq("__rank", "__term")))
      .groupBy(col("__term"))
      .agg(min(col("__rank") + lit(1L)).as("__rank"))
    df.select(col(idCol),
        posexplode(TextFunctions.tokens(lower(col(textCol))))
          .as(Seq("pos", "__tok")))
      .join(broadcast(rankedTerms), col("__tok") === col("__term"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("__rank"), lit(0L)).as("token_id"))
  }

  /** The linear-scan formulation [[encode]] replaced (per-token
    * `array_position`, O(k) per probe). Kept package-private as the
    * reference implementation VocabSpec pins the map lookup against.
    */
  private[graft] def encodeViaScan(
      df: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      termCol: String = "term", countCol: String = "n_total",
  ): DataFrame = {
    val ranked = rankedVocabArray(vocab, termCol, countCol)
    df.select(col(idCol),
        posexplode(TextFunctions.tokens(lower(col(textCol))))
          .as(Seq("pos", "__tok")))
      .crossJoin(broadcast(ranked))
      .select(col(idCol), col("pos"),
        array_position(col("__vocab"), col("__tok")).as("token_id"))
  }

  /** One row, one array: vocabulary terms ranked (count desc, term
    * asc) — `array_sort` on (neg-count, term) structs gives exactly
    * that order without a window.
    */
  private def rankedVocabArray(
      vocab: DataFrame, termCol: String, countCol: String,
  ): DataFrame =
    vocab.agg(array_sort(collect_list(struct(
        (-col(countCol)).as("n"), col(termCol).as("t")))).as("__vs"))
      .select(transform(col("__vs"), s => s("t")).as("__vocab"))

  /** DuckDB rendering of [[encode]] over `documents(doc_id, text)`
    * restricted by `whereClause`, with the vocabulary from `vocabSql`
    * (any query producing `term` and `n_total` columns).
    */
  def encodeSql(vocabSql: String, whereClause: String): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""WITH vr AS (SELECT term, row_number() OVER (ORDER BY n_total DESC, term) AS rid
       |  FROM ($vocabSql)),
       |v AS (SELECT coalesce(list(term ORDER BY rid), []) AS vocab FROM vr),
       |d AS (SELECT doc_id, $toks AS toks FROM documents $whereClause),
       |e AS (SELECT doc_id, unnest(list_transform(toks,
       |  (t, i) -> {'pos': i - 1, 'id': list_position(v.vocab, t)})) AS u
       |  FROM d, v)
       |SELECT doc_id, CAST(u.pos AS INT) AS pos, CAST(u.id AS BIGINT) AS token_id
       |FROM e""".stripMargin
  }

  /** Out-of-vocabulary rate per document against a reference
    * vocabulary (e.g. [[topTokens]] of a trusted corpus version) —
    * a cheap drift/quality signal: gibberish, wrong-language and
    * machine-mangled documents score high. Output:
    * `(idCol, n_tokens, n_oov, oov_rate)`; an empty document rates
    * `0.0` (nothing is out of vocabulary in nothing), and an EMPTY
    * vocabulary rates every token OOV (rate `1.0`) — the oracle's
    * `list(...)` coalesces to `[]` to match, since SQL `list` of zero
    * rows is NULL and `NOT list_contains(NULL, t)` would silently
    * drop every token the other way.
    *
    * Determinism: counts are exact integers; the rate is ONE IEEE
    * division of exactly-representable ints — engine-exact.
    *
    * 100 TB shape: like [[encode]], the vocabulary is a dimension
    * table — each token occurrence tests membership through a
    * broadcast HASH join (codegen'd O(1) probe), then counts
    * re-aggregate per document. The earlier formulation broadcast the
    * vocab as one array row and ran an `array_contains` HOF filter —
    * map-only, but O(k) per token AND interpreted (Spark higher-order
    * lambdas are CodegenFallback), which at tokenizer-scale k is
    * 10⁷–10⁸ compares per document; a broadcast `map_contains_key`
    * is the same linear scan in disguise (Catalyst `MapData` has no
    * hash index — SCALE.md). The re-aggregation shuffle carries one
    * pre-combined row per document per map partition (map-side
    * partial agg), never token rows and never text — O(docs), not
    * O(corpus). `explode_outer` keeps empty documents (rate 0.0).
    */
  def oovRate(
      df: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      termCol: String = "term",
  ): DataFrame = {
    Seq("__vocab", "__term", "__toks").foreach(c =>
      require(!df.columns.contains(c),
        s"oovRate reserves column name $c; rename it in the input"))
    val terms = vocab.select(col(termCol).as("__term")).distinct()
    df.select(col(idCol),
        explode_outer(TextFunctions.tokens(lower(col(textCol))))
          .as("__tok"))
      .join(broadcast(terms), col("__tok") === col("__term"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__tok")).cast("int").as("n_tokens"),
        (count(col("__tok")) - count(col("__term"))).cast("int").as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Rank-based difficulty scoring against a ranked vocabulary — the
    * curriculum signal: a document's tokens are scored by their
    * vocabulary RANK (1 = most frequent; out-of-vocabulary tokens get
    * rank k+1, one past the rarest ranked term), and the document by
    * the mean. Common-word prose scores low, rare-word/technical text
    * scores high, gibberish scores highest — the ordering curriculum
    * schedules and difficulty-stratified samplers consume. Output:
    * `(idCol, n_tokens, n_oov, sum_rank, mean_rank)`; an empty
    * document scores `(0, 0, 0, 0.0)`.
    *
    * Determinism: ranks are exact integers ([[topTokens]]' count-desc
    * term-asc order), `sum_rank` is an exact BIGINT sum, and
    * `mean_rank` is ONE IEEE division of exactly-representable ints —
    * engine-exact, like [[oovRate]]. Duplicate vocabulary terms keep
    * their best (lowest) rank, and k is the greatest ASSIGNED rank.
    *
    * 100 TB shape: identical to [[oovRate]] — the vocabulary is a
    * broadcast dimension (hash-join probe per token, k+1 rides along
    * as a broadcast 1-row frame), the re-aggregation ships one
    * pre-combined row per document per map partition, and text never
    * shuffles.
    */
  def tokenRarity(
      df: DataFrame, idCol: String, textCol: String, vocab: DataFrame,
      termCol: String = "term", countCol: String = "n_total",
  ): DataFrame = {
    Seq("__vs", "__vocab", "__term", "__rank", "__k", "__tok",
        "n_tokens", "n_oov", "sum_rank", "mean_rank")
      .foreach(c => require(!df.columns.contains(c),
        s"tokenRarity reserves column name $c; rename it in the input"))
    val rankedTerms = rankedVocabArray(vocab, termCol, countCol)
      .select(posexplode(col("__vocab")).as(Seq("__rank", "__term")))
      .groupBy(col("__term"))
      .agg(min(col("__rank") + lit(1L)).as("__rank"))
    val kdf = rankedTerms
      .agg(coalesce(max(col("__rank")), lit(0L)).as("__k"))
    df.select(col(idCol),
        explode_outer(TextFunctions.tokens(lower(col(textCol))))
          .as("__tok"))
      .join(broadcast(rankedTerms), col("__tok") === col("__term"), "left")
      .crossJoin(broadcast(kdf))
      .groupBy(col(idCol))
      .agg(count(col("__tok")).cast("int").as("n_tokens"),
        (count(col("__tok")) - count(col("__rank"))).cast("int")
          .as("n_oov"),
        coalesce(sum(when(col("__tok").isNotNull,
            coalesce(col("__rank"), col("__k") + lit(1L)))),
          lit(0L)).as("sum_rank"))
      .withColumn("mean_rank",
        when(col("n_tokens") > 0,
          col("sum_rank").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** DuckDB rendering of [[tokenRarity]] over `documents(doc_id,
    * text)` restricted by `whereClause`, with the vocabulary from
    * `vocabSql` (any query producing `term` and `n_total` columns).
    */
  def tokenRaritySql(vocabSql: String, whereClause: String): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""WITH vr0 AS (SELECT term, row_number() OVER (ORDER BY n_total DESC, term) AS rid
       |  FROM ($vocabSql)),
       |vr AS (SELECT term, min(rid) AS rid FROM vr0 GROUP BY term),
       |kk AS (SELECT coalesce(max(rid), 0) AS k FROM vr),
       |d AS (SELECT doc_id, $toks AS toks FROM documents $whereClause),
       |e AS (SELECT doc_id, unnest(toks) AS tok FROM d),
       |j AS (SELECT e.doc_id, e.tok, vr.rid FROM e LEFT JOIN vr ON e.tok = vr.term),
       |c AS (SELECT doc_id, CAST(count(tok) AS INT) AS n_tokens,
       |  CAST(count(tok) - count(rid) AS INT) AS n_oov,
       |  CAST(sum(coalesce(rid, k + 1)) AS BIGINT) AS sum_rank
       |  FROM j, kk GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(c.n_tokens, 0) AS n_tokens,
       |  coalesce(c.n_oov, 0) AS n_oov,
       |  coalesce(c.sum_rank, 0) AS sum_rank,
       |  CASE WHEN coalesce(c.n_tokens, 0) > 0
       |    THEN CAST(c.sum_rank AS DOUBLE) / CAST(c.n_tokens AS DOUBLE)
       |    ELSE 0.0 END AS mean_rank
       |FROM (SELECT doc_id FROM documents $whereClause) d
       |LEFT JOIN c USING (doc_id)""".stripMargin
  }

  /** DuckDB rendering of [[oovRate]] over `documents(doc_id, text)`
    * restricted by `whereClause`, with the vocabulary from
    * `vocabSql` (any query producing a `term` column).
    */
  def oovRateSql(vocabSql: String, whereClause: String): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""WITH v AS (SELECT coalesce(list(term ORDER BY term), []) AS vocab FROM ($vocabSql)),
       |d AS (SELECT doc_id, $toks AS toks
       |  FROM documents $whereClause),
       |c AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
       |  CAST(len(list_filter(toks, t -> NOT list_contains(v.vocab, t))) AS INT) AS n_oov
       |  FROM d, v)
       |SELECT doc_id, n_tokens, n_oov,
       |  CASE WHEN n_tokens > 0
       |    THEN CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       |    ELSE 0.0 END AS oov_rate
       |FROM c""".stripMargin
  }

  /** Per-group lexical-diversity census — the cheap gibberish/
    * boilerplate detector a mixture planner reads per source: token
    * volume, distinct types, hapax legomena (frequency-1 types), and
    * the type-token / hapax ratios in floor-quantized ppm (the
    * library's log-free device — non-negative operands, so Spark
    * `div` ≡ DuckDB `//`). Machine-generated or template text shows
    * abnormally LOW TTR (few types repeated endlessly); OCR noise or
    * gibberish shows abnormally HIGH hapax fraction.
    *
    * Shape: one `(group, word)`-keyed census shuffle (map-side
    * combined), then a group-keyed rollup of census rows — the
    * second aggregate is types-sized, never corpus-sized. Output:
    * `(g, n_tokens, n_types, n_hapax, ttr_ppm, hapax_ppm)`.
    */
  def lexicalDiversity(
      docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs
      .select(col(groupCol).as("g"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("g"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("g"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("g"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("n_types * 1000000L div n_tokens").as("ttr_ppm"),
        expr("n_hapax * 1000000L div n_tokens").as("hapax_ppm"))

  /** DuckDB rendering of [[lexicalDiversity]] over
    * `documents(source, text)` restricted by `whereClause`.
    */
  def lexicalDiversitySql(
      groupCol: String, whereClause: String,
      outGroupCol: String = ""): String = {
    val outG = if (outGroupCol.isEmpty) groupCol else outGroupCol
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""WITH w AS (SELECT $groupCol AS g, unnest($toks) AS w
       |  FROM documents $whereClause),
       |c AS (SELECT g, w, count(*) AS cnt FROM w GROUP BY g, w),
       |r AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(*) AS BIGINT) AS n_types,
       |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_hapax
       |  FROM c GROUP BY g)
       |SELECT g AS $outG, n_tokens, n_types, n_hapax,
       |  CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_ppm,
       |  CAST(n_hapax * 1000000 // n_tokens AS BIGINT) AS hapax_ppm
       |FROM r ORDER BY $outG""".stripMargin
  }

  /** Heaps-law vocabulary growth census — how the TYPE count grows
    * as the corpus grows, the curve that sizes a tokenizer vocabulary
    * (and predicts OOV mass) before training on the full corpus:
    * Heaps' law V(n) ≈ K·n^β says types grow sublinearly in tokens;
    * this op produces the empirical curve as (cumulative tokens,
    * cumulative types) per ingest bucket, with the fit left to the
    * analyst (a log-log regression is float territory; the census is
    * the deterministic, hashable part).
    *
    * Cumulative distinct WITHOUT re-scanning prefixes: each type's
    * FIRST bucket is a min-aggregate over the token census — a type
    * contributes to the cumulative count of every bucket ≥ its first
    * appearance, so per-bucket new-type counts running-summed give
    * the exact prefix-distinct series. One token census + two
    * bucket-keyed aggregates + a running sum over the BUCKET frame
    * (bucket count is metadata-sized — the sanctioned
    * single-partition window, same stance as the shard manifest).
    *
    * Output: `(bucket, n_tokens, n_types_new, cum_tokens,
    * cum_types)`, one row per ingest bucket in order.
    */
  def heapsGrowth(
      df: DataFrame, idCol: String, textCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth $bucketWidth must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(
      expr(s"$idCol div ${bucketWidth}L").as("bucket"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
    val firstB = toks.groupBy(col("tok"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_types_new"))
    val occ = toks.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    occ.join(firstB, Seq("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("n_types_new"), lit(0L)).as("n_types_new"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_types", sum(col("n_types_new")).over(w))
  }

  /** DuckDB rendering of [[heapsGrowth]] over `documents(doc_id,
    * text)` restricted by `whereClause`.
    */
  def heapsGrowthSql(bucketWidth: Long, whereClause: String): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""WITH t AS MATERIALIZED (SELECT doc_id // $bucketWidth AS bucket,
       |    unnest($toks) AS tok
       |  FROM documents $whereClause),
       |fb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_types_new
       |  FROM (SELECT tok, MIN(bucket) AS bucket FROM t GROUP BY tok) f
       |  GROUP BY bucket),
       |occ AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
       |  FROM t GROUP BY bucket)
       |SELECT occ.bucket, occ.n_tokens,
       |  CAST(coalesce(fb.n_types_new, 0) AS BIGINT) AS n_types_new,
       |  CAST(SUM(occ.n_tokens) OVER (ORDER BY occ.bucket) AS BIGINT)
       |    AS cum_tokens,
       |  CAST(SUM(coalesce(fb.n_types_new, 0)) OVER (ORDER BY occ.bucket)
       |    AS BIGINT) AS cum_types
       |FROM occ LEFT JOIN fb ON occ.bucket = fb.bucket
       |ORDER BY occ.bucket""".stripMargin
  }
}
