package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece segmentation — greedy longest-match-first subword
  * tokenization against a fixed vocabulary (the BERT-family encoder,
  * the OTHER classic tokenizer beside [[Bpe]]'s merge-list encoder):
  * at each position take the LONGEST vocabulary piece that matches
  * (continuation positions match `##`-prefixed pieces); if no piece
  * matches at some position the whole word becomes `[UNK]` — no
  * backtracking, exactly the published algorithm.
  *
  * The vocabulary here is deterministic and oracle-reconstructible:
  * the top-`topN` census words (freq desc, word asc — the library's
  * standard tie-break) as start pieces, plus `[a-z0-9]` singles in
  * both start and `##` continuation form. A trained vocabulary would
  * broadcast the same way and change no plan shape.
  *
  * Scale shape (the [[Bpe.segmentWords]] argument, verbatim): the
  * greedy loop runs per DISTINCT word over the census — vocabulary-
  * sized, not corpus-sized — with the piece set broadcast; the only
  * corpus-scale stage is the census aggregation itself, and encoding
  * a corpus afterwards is a broadcast join of tokens against the
  * segmented census. `mapPartitions` is justified for the same
  * reason as BPE's: the per-position longest-match loop over an
  * arbitrary-size vocabulary set exceeds what an expression tree can
  * express, and it never touches corpus rows.
  *
  * Cross-engine: positions and lengths are CODE POINTS (DuckDB
  * `substr`/`length` count code points; Java strings are UTF-16, so
  * the loop walks `codePointAt` — the same surrogate-pair hazard
  * [[Bpe.segmentWords]] guards against).
  */
object WordPiece {

  /** `[a-z0-9]` single-character pieces. */
  val CharPieces: Seq[String] =
    (('a' to 'z') ++ ('0' to '9')).map(_.toString)

  /** Top-`topN` census words by (freq desc, word asc) — the start-
    * piece word list (driver-side, bounded like BPE's per-round
    * argmax; plans as TakeOrdered, never a full sort).
    */
  def topWords(census: DataFrame, topN: Int): Seq[String] =
    census.orderBy(col("freq").desc, col("word"))
      .limit(topN).select("word").collect().map(_.getString(0)).toSeq

  /** Greedy longest-match segmentation of a word against start and
    * continuation piece sets (continuation pieces WITHOUT the `##`
    * marker here; the rendered output adds it).
    */
  def segmentWord(
      word: String, start: Set[String], cont: Set[String]): (String, Boolean) = {
    val maxStart = if (start.isEmpty) 0 else start.iterator.map(_.length).max
    val maxCont = if (cont.isEmpty) 0 else cont.iterator.map(_.length).max
    val n = word.length
    val out = new StringBuilder
    var pos = 0
    while (pos < n) {
      val atStart = pos == 0
      val pieces = if (atStart) start else cont
      val maxLen = math.min(n - pos, if (atStart) maxStart else maxCont)
      // longest first; lengths are UTF-16 units but candidate cuts
      // must not split a surrogate pair — skip cut points that land
      // inside one (equivalently: walk code-point boundaries)
      var l = maxLen
      var hit = -1
      while (l >= 1 && hit < 0) {
        val cutOk = !Character.isLowSurrogate(
          if (pos + l < n) word.charAt(pos + l) else 'x')
        if (cutOk && pieces.contains(word.substring(pos, pos + l))) hit = l
        l -= 1
      }
      if (hit < 0) return ("[UNK]", true)
      if (!atStart) out.append(" ##") else ()
      out.append(word.substring(pos, pos + hit))
      pos += hit
    }
    (out.toString, false)
  }

  /** Segment every census word: `(word, pieces, unk)` with `pieces`
    * the space-joined rendering (`##` marks continuations).
    */
  def segment(
      words: DataFrame, start: Set[String], cont: Set[String]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bStart = spark.sparkContext.broadcast(start)
    val bCont = spark.sparkContext.broadcast(cont)
    words.select(col("word").cast("string")).as[String]
      .mapPartitions { it =>
        val s = bStart.value
        val c = bCont.value
        it.map { w =>
          val (pieces, unk) = segmentWord(w, s, c)
          (w, pieces, unk)
        }
      }
      .toDF("word", "pieces", "unk")
  }

  /** End-to-end: census → deterministic vocab → segmented census.
    * Census words literally starting with `##` are excluded from the
    * start-piece list BEFORE ranking (they would be misread as
    * continuation pieces by the rendered form).
    */
  def segmentCensus(census: DataFrame, topN: Int = 100): DataFrame = {
    val words = topWords(
      census.filter(!col("word").startsWith("##")), topN)
    val start = words.toSet ++ CharPieces
    val cont = CharPieces.toSet
    segment(census.select("word"), start, cont)
  }

  /** Per-document encode statistics with a vocabulary trained on a
    * DIFFERENT slice — the production encode path: the top-`topN`
    * start words come from `vocabCensus` (the training corpus), the
    * encode corpus' own distinct words segment against that vocab
    * (vocabulary-sized work), and documents resolve through a
    * broadcast join of tokens against the segmented census (the
    * [[Bpe]] `encodeStats` topology). Tokens whose segmentation hits
    * the `[UNK]` rule count 1 subword and 1 unk. Output:
    * `(id, n_tokens, n_subwords, n_unk)`.
    */
  def encodeStats(
      docs: DataFrame, idCol: String, textCol: String,
      vocabCensus: DataFrame, topN: Int = 100): DataFrame = {
    val words = topWords(
      vocabCensus.filter(!col("word").startsWith("##")), topN)
    val start = words.toSet ++ CharPieces
    val cont = CharPieces.toSet
    val seg = segment(
      Bpe.wordCensus(docs, textCol).select("word"), start, cont)
      .withColumn("__n_sub",
        when(col("unk"), lit(1L))
          .otherwise(size(split(col("pieces"), " ")).cast("long")))
      .withColumn("__u", when(col("unk"), lit(1L)).otherwise(lit(0L)))
      .select(col("word"), col("__n_sub"), col("__u"))
    docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .join(broadcast(seg), Seq("word"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__n_sub")).as("n_subwords"),
        sum(col("__u")).as("n_unk"))
  }

  /** DuckDB rendering of [[encodeStats]]: vocab words from
    * `vocabWhere`, encode corpus from `docsWhere`.
    */
  def encodeStatsSql(
      docsWhere: String, vocabWhere: String, topN: Int = 100): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val seg = segmentSql(docsWhere, vocabWhere, topN)
    s"""WITH seg AS (SELECT word,
       |    CASE WHEN unk THEN 1 ELSE len(string_split(pieces, ' ')) END
       |      AS n_sub,
       |    CASE WHEN unk THEN 1 ELSE 0 END AS u
       |  FROM ($seg) sq),
       |tok AS (SELECT doc_id AS id, unnest($toks) AS word
       |  FROM documents $docsWhere)
       |SELECT id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       |  CAST(sum(u) AS BIGINT) AS n_unk
       |FROM tok JOIN seg USING (word)
       |GROUP BY id ORDER BY id""".stripMargin
  }

  /** The segmentation core shared by [[segmentCensusSql]] (vocab and
    * census from the same slice) and [[encodeStatsSql]] (vocab from
    * `vocabWhere`, words from `docsWhere`).
    */
  private def segmentSql(
      censusWhere: String, vocabWhere: String, topN: Int): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""SELECT * FROM (
       |WITH RECURSIVE
       |w AS (SELECT word, CAST(sum(1) AS BIGINT) AS freq FROM (
       |    SELECT unnest($toks) AS word FROM documents $censusWhere)
       |  GROUP BY word),
       |wv AS (SELECT word, CAST(sum(1) AS BIGINT) AS freq FROM (
       |    SELECT unnest($toks) AS word FROM documents $vocabWhere)
       |  GROUP BY word),
       |vw AS (SELECT word FROM wv WHERE word NOT LIKE '##%'
       |  ORDER BY freq DESC, word LIMIT $topN),
       |chars AS (SELECT chr(CAST(range AS INT)) AS c FROM range(97, 123)
       |  UNION ALL SELECT chr(CAST(range AS INT)) FROM range(48, 58)),
       |vocab AS (SELECT word AS piece FROM vw
       |  UNION SELECT c FROM chars
       |  UNION SELECT '##' || c FROM chars),
       |seg AS (
       |  SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS pieces, false AS unk
       |  FROM w
       |  UNION ALL
       |  SELECT s.word,
       |    CASE WHEN best.blen IS NULL THEN length(s.word) + 1
       |         ELSE s.pos + best.blen END AS pos,
       |    CASE WHEN best.blen IS NULL THEN '[UNK]'
       |         WHEN s.pos = 1 THEN substr(s.word, s.pos, best.blen)
       |         ELSE s.pieces || ' ##' || substr(s.word, s.pos, best.blen)
       |         END AS pieces,
       |    best.blen IS NULL AS unk
       |  FROM seg s
       |  LEFT JOIN LATERAL (
       |    SELECT max(length(CASE WHEN s.pos = 1 THEN v.piece
       |                           ELSE substr(v.piece, 3) END)) AS blen
       |    FROM vocab v
       |    WHERE (s.pos = 1 AND v.piece NOT LIKE '##%'
       |           AND v.piece = substr(s.word, s.pos, length(v.piece)))
       |       OR (s.pos > 1 AND v.piece LIKE '##%'
       |           AND substr(v.piece, 3) =
       |               substr(s.word, s.pos, length(v.piece) - 2))
       |  ) best ON true
       |  WHERE s.pos <= length(s.word) AND NOT s.unk
       |)
       |SELECT word, pieces, unk FROM seg
       |WHERE pos > length(word) OR unk
       |) q""".stripMargin
  }

  /** DuckDB rendering of [[segmentCensus]] over the word census of
    * `documents` restricted by `whereClause` — a recursive CTE whose
    * step takes the LATERAL longest vocabulary match at the current
    * position.
    *
    * Two formulation constraints are load-bearing (DuckDB 1.0.0
    * planner): no `MATERIALIZED` hints, and the final ORDER BY lives
    * in an OUTER wrapper — a top-level ORDER BY directly on the
    * recursive+LATERAL body makes every LATERAL probe miss (all
    * words come back `[UNK]`; reproduced and pinned while building
    * this oracle).
    */
  def segmentCensusSql(whereClause: String, topN: Int = 100): String =
    segmentSql(whereClause, whereClause, topN) + " ORDER BY word"
}
