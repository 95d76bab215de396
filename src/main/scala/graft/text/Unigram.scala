package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM-style subword segmentation (the SentencePiece family's
  * OTHER tokenizer, beside [[Bpe]]'s merge list and [[WordPiece]]'s
  * greedy longest-match): each vocabulary piece carries a COST, and a
  * word's segmentation is the Viterbi minimum-total-cost path over
  * its positions. Where SentencePiece uses float `−log p` trained by
  * EM, this library's variant is deliberately ALL-INTEGER so the
  * oracle matches bit-for-bit: `cost(g) = 1 + Fmax div freq(g)` over
  * the top-`topV` character n-grams (length ≤ `maxGram`) of the word
  * census, freq-desc/gram-asc tie-break — monotone in rarity, log-
  * free (the PMI-lift/Gini trick applied to tokenizer scores). An
  * out-of-vocabulary single character costs `Big` (the UNK analog:
  * coverage is total, garbage is priced out).
  *
  * Determinism: ties between equal-cost paths are broken by FEWER
  * pieces — the DP minimizes the single integer `cost·1024 + pieces`
  * (pieces ≤ `MaxLen` < 1024, so the packed order IS the
  * lexicographic (cost, pieces) order). Words longer than [[MaxLen]]
  * code points skip the DP as all-fallback singles: `len·Big` cost,
  * `len` pieces.
  *
  * Scale shape (the [[Bpe.segmentWords]] argument): the Viterbi loop
  * runs per DISTINCT census word with the piece-cost table broadcast
  * — vocabulary-sized work, never corpus-sized; corpus-scale stages
  * are the census aggregation and the final broadcast join of tokens
  * against segmented words. `mapPartitions` is justified exactly as
  * for WordPiece: an O(len·maxGram) DP per word exceeds expression
  * trees, and it never touches corpus rows. Positions count CODE
  * POINTS on both engines (DuckDB `substr`/`length` vs the Java
  * code-point walk — the surrogate-pair hazard again).
  */
object Unigram {

  /** DP words longer than this fall back to per-character pricing. */
  val MaxLen = 30

  /** OOV single-character cost. */
  val Big = 1000000000L

  /** Character n-grams (1..`maxGram` code points) of every census
    * word, freq-weighted: `(gram, gfreq)`.
    */
  def gramFreqs(census: DataFrame, maxGram: Int = 4): DataFrame =
    census
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, $maxGram), l ->
           |  case when length(word) >= l
           |    then transform(sequence(1, length(word) - l + 1),
           |      s -> substring(word, s, l))
           |    else array() end))""".stripMargin)).as("gram"))
      .groupBy(col("gram")).agg(sum(col("freq")).as("gfreq"))

  /** Top-`topV` grams priced `1 + Fmax div gfreq` (Fmax = the top
    * gram's own frequency): `(gram, cost)`. Plans as TakeOrdered.
    */
  def vocabCosts(census: DataFrame, maxGram: Int = 4, topV: Int = 200): DataFrame = {
    val top = gramFreqs(census, maxGram)
      .orderBy(col("gfreq").desc, col("gram")).limit(topV)
    val fmax = top.agg(max(col("gfreq")).as("fmax"))
    top.crossJoin(broadcast(fmax))
      .select(col("gram"), (lit(1L) + expr("fmax div gfreq")).as("cost"))
  }

  /** Viterbi DP over one word's code points against the broadcast
    * cost table. Returns `(cost, pieces)`.
    */
  private[text] def viterbi(
      word: String, costs: Map[String, Long], maxGram: Int): (Long, Long) = {
    val cps = word.codePoints.toArray
    val n = cps.length
    if (n == 0) return (0L, 0L)
    if (n > MaxLen) return (n.toLong * Big, n.toLong)
    val d = Array.fill(n + 1)(Long.MaxValue)
    d(0) = 0L
    var j = 1
    while (j <= n) {
      var l = 1
      val lMax = math.min(maxGram, j)
      while (l <= lMax) {
        if (d(j - l) != Long.MaxValue) {
          val g = new String(cps, j - l, l)
          val cost = costs.get(g) match {
            case Some(c) => c
            case None if l == 1 => Big
            case None => -1L
          }
          if (cost >= 0L) {
            val cand = d(j - l) + cost * 1024L + 1L
            if (cand < d(j)) d(j) = cand
          }
        }
        l += 1
      }
      j += 1
    }
    (d(n) / 1024L, d(n) % 1024L)
  }

  /** Segment every census word: `(word, cost, pieces)`. */
  def segmentCosts(
      census: DataFrame, maxGram: Int = 4, topV: Int = 200): DataFrame = {
    val spark = census.sparkSession
    import spark.implicits._
    val costs = vocabCosts(census, maxGram, topV)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = spark.sparkContext.broadcast(costs)
    census.select(col("word").cast("string")).as[String]
      .mapPartitions { it =>
        val m = b.value
        it.map { w => val (c, p) = viterbi(w, m, maxGram); (w, c, p) }
      }
      .toDF("word", "cost", "pieces")
  }

  /** Per-document encode cost: tokens resolve through a broadcast
    * join against the segmented census (vocab and census from the
    * same `docs` slice — every token hits). Output:
    * `(id, n_tokens, cost_total, pieces_total)`.
    */
  def encodeCost(
      docs: DataFrame, idCol: String, textCol: String,
      maxGram: Int = 4, topV: Int = 200): DataFrame = {
    val seg = segmentCosts(Bpe.wordCensus(docs, textCol), maxGram, topV)
    docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .join(broadcast(seg), Seq("word"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("cost")).as("cost_total"),
        sum(col("pieces")).as("pieces_total"))
  }

  /** DuckDB rendering of [[encodeCost]] over `documents` rows
    * selected by `whereClause`: the Viterbi DP unrolls as one CTE per
    * position 1..[[MaxLen]] (each `d_j` takes the min packed
    * `cost·1024 + pieces` over the ≤ `maxGram` edges ending at `j`)
    * — the same unrolled-chained-CTE device as the BPE trainer
    * oracle, position-indexed instead of round-indexed. Every shared
    * CTE is `MATERIALIZED`: DuckDB 1.0 inlines plain CTEs per
    * reference, and with each `d_j` feeding up to `maxGram` later
    * positions the inlining cascades exponentially down to the
    * parquet scan ("too many open files" long before any result).
    * The hint is safe here because nothing is recursive — the
    * WordPiece oracle's no-hint constraint applies to its
    * recursive+LATERAL body only.
    */
  def encodeCostSql(
      whereClause: String, maxGram: Int = 4, topV: Int = 200): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val dp = (1 to MaxLen).map { j =>
      val arms = (1 to math.min(maxGram, j)).map { l =>
        s"""SELECT e.word, d.comb + e.cost * 1024 + 1 AS comb
           |    FROM ec e JOIN d${j - l} d USING (word)
           |    WHERE e.j = $j AND e.l = $l""".stripMargin
      }.mkString("\n    UNION ALL ")
      s"""d$j AS MATERIALIZED (SELECT word, min(comb) AS comb FROM (
         |    $arms) u$j GROUP BY word)""".stripMargin
    }.mkString(",\n")
    val dall = (1 to MaxLen)
      .map(j => s"SELECT $j AS j, word, comb FROM d$j")
      .mkString("\n  UNION ALL ")
    s"""WITH tk AS MATERIALIZED (SELECT unnest($toks) AS word
       |    FROM documents $whereClause),
       |w AS MATERIALIZED (SELECT word, CAST(sum(1) AS BIGINT) AS freq
       |  FROM tk GROUP BY word),
       |g AS (SELECT freq, unnest(
       |    flatten(list_transform(range(1, $maxGram + 1), l ->
       |      CASE WHEN length(word) >= l
       |        THEN list_transform(range(1, length(word) - l + 2),
       |          s -> substr(word, CAST(s AS BIGINT), CAST(l AS BIGINT)))
       |        ELSE [] END))) AS gram
       |  FROM w),
       |gf AS (SELECT gram, CAST(sum(freq) AS BIGINT) AS gfreq
       |  FROM g GROUP BY gram),
       |v AS (SELECT gram, gfreq FROM gf ORDER BY gfreq DESC, gram LIMIT $topV),
       |fm AS (SELECT max(gfreq) AS fmax FROM v),
       |vc AS (SELECT gram, 1 + fmax // gfreq AS cost FROM v, fm),
       |words AS MATERIALIZED (SELECT word, length(word) AS n FROM w
       |  WHERE length(word) <= $MaxLen),
       |e AS (SELECT word, CAST(j AS INT) AS j, CAST(l AS INT) AS l,
       |    substr(word, j - l + 1, l) AS gram
       |  FROM words, unnest(range(1, n + 1)) AS uj(j),
       |    unnest(range(1, $maxGram + 1)) AS ul(l)
       |  WHERE l <= j),
       |ec AS MATERIALIZED (SELECT e.word, e.j, e.l,
       |    CASE WHEN vc.cost IS NOT NULL THEN vc.cost ELSE $Big END AS cost
       |  FROM e LEFT JOIN vc ON vc.gram = e.gram
       |  WHERE vc.cost IS NOT NULL OR e.l = 1),
       |d0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS comb FROM words),
       |$dp,
       |dall AS ($dall),
       |seg AS (
       |  SELECT w.word, d.comb // 1024 AS cost, d.comb % 1024 AS np
       |  FROM words w JOIN dall d ON d.word = w.word AND d.j = w.n
       |  UNION ALL
       |  SELECT word, length(word) * $Big, length(word) FROM w
       |  WHERE length(word) > $MaxLen),
       |tok AS (SELECT doc_id AS id, unnest($toks) AS word
       |  FROM documents $whereClause)
       |SELECT id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(cost) AS BIGINT) AS cost_total,
       |  CAST(sum(np) AS BIGINT) AS pieces_total
       |FROM tok JOIN seg USING (word)
       |GROUP BY id ORDER BY id""".stripMargin
  }
}
