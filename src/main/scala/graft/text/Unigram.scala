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

  /** Per-byte cost under byte fallback — far above any vocab piece
    * cost in practice (byte pieces are the LAST resort, as in
    * SentencePiece's `--byte_fallback`) but 1000× cheaper than the
    * UNK price, so covered-but-rare glyphs stop dominating a
    * document's total.
    */
  val ByteCost = 1000000L

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

  /** UTF-8 byte width of one code point. */
  private def utf8Bytes(cp: Int): Long =
    if (cp < 0x80) 1L else if (cp < 0x800) 2L
    else if (cp < 0x10000) 3L else 4L

  /** Viterbi DP over one word's code points against the broadcast
    * cost table. Returns `(cost, pieces)`.
    *
    * `byteFallback = true` is SentencePiece's `--byte_fallback`: an
    * OOV single character decomposes into its UTF-8 bytes — `nb`
    * pieces at `nb·`[[ByteCost]] total — instead of one UNK piece at
    * [[Big]], so encode is TOTAL with piece counts that reflect
    * actual byte emission (a downstream token budget can trust
    * `pieces` even on glyphs the census never saw). Long words
    * (> [[MaxLen]]) price as all bytes under fallback, all UNK
    * singles otherwise. Piece counts stay < 1024 either way
    * (≤ MaxLen·4 = 120), so the packed `cost·1024 + pieces` order
    * still IS the lexicographic (cost, pieces) order.
    */
  private[text] def viterbi(
      word: String, costs: Map[String, Long], maxGram: Int,
      byteFallback: Boolean = false): (Long, Long) = {
    val cps = word.codePoints.toArray
    val n = cps.length
    if (n == 0) return (0L, 0L)
    if (n > MaxLen) {
      return if (byteFallback) {
        val bytes = cps.map(utf8Bytes).sum
        (bytes * ByteCost, bytes)
      } else (n.toLong * Big, n.toLong)
    }
    val d = Array.fill(n + 1)(Long.MaxValue)
    d(0) = 0L
    var j = 1
    while (j <= n) {
      var l = 1
      val lMax = math.min(maxGram, j)
      while (l <= lMax) {
        if (d(j - l) != Long.MaxValue) {
          val g = new String(cps, j - l, l)
          // edge increment: packed cost·1024 + pieces for this piece
          val inc = costs.get(g) match {
            case Some(c) => c * 1024L + 1L
            case None if l == 1 =>
              if (byteFallback) {
                val nb = utf8Bytes(cps(j - 1))
                nb * ByteCost * 1024L + nb
              } else Big * 1024L + 1L
            case None => -1L
          }
          if (inc >= 0L) {
            val cand = d(j - l) + inc
            if (cand < d(j)) d(j) = cand
          }
        }
        l += 1
      }
      j += 1
    }
    (d(n) / 1024L, d(n) % 1024L)
  }

  /** The Viterbi DP of [[viterbi]] with BACKPOINTERS: returns the
    * `(cost, pieces)` of the min-(cost, pieces) path — the SAME DP,
    * run once (callers needing both the cost and the piece sequence
    * must not pay two DPs per word). Ties between equal packed costs
    * keep the shortest edge (first l scanned) — any tie path's pieces
    * concatenate back to the word, so the decode contract below is
    * tie-independent. OOV singles under byte fallback emit one
    * `<0XNN>` marker per UTF-8 byte (uppercase X: census words are
    * lowercased by tokenization, so a marker can never collide with a
    * real vocabulary piece); without fallback the OOV single is the
    * character itself (the UNK price buys a literal piece). Long
    * words (> [[MaxLen]]) are all-byte markers under fallback,
    * per-character singles otherwise — matching [[viterbi]]'s counts
    * exactly (UnigramSpec pins cost AND count equality).
    */
  private[text] def viterbiPieces(
      word: String, costs: Map[String, Long], maxGram: Int,
      byteFallback: Boolean = false): (Long, Seq[String]) = {
    val cps = word.codePoints.toArray
    val n = cps.length
    def byteMarkers(cp: Int): Seq[String] =
      new String(Character.toChars(cp))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .toSeq.map(b => f"<0X${b & 0xff}%02X>")
    if (n == 0) return (0L, Seq.empty)
    if (n > MaxLen) {
      return if (byteFallback) {
        val bytes = cps.map(utf8Bytes).sum
        (bytes * ByteCost, cps.toSeq.flatMap(byteMarkers))
      } else
        (n.toLong * Big, cps.toSeq.map(cp => new String(Character.toChars(cp))))
    }
    val d = Array.fill(n + 1)(Long.MaxValue)
    val back = Array.fill(n + 1)(0) // chosen edge length at j
    d(0) = 0L
    var j = 1
    while (j <= n) {
      var l = 1
      val lMax = math.min(maxGram, j)
      while (l <= lMax) {
        if (d(j - l) != Long.MaxValue) {
          val g = new String(cps, j - l, l)
          val inc = costs.get(g) match {
            case Some(c) => c * 1024L + 1L
            case None if l == 1 =>
              if (byteFallback) {
                val nb = utf8Bytes(cps(j - 1))
                nb * ByteCost * 1024L + nb
              } else Big * 1024L + 1L
            case None => -1L
          }
          if (inc >= 0L) {
            val cand = d(j - l) + inc
            if (cand < d(j)) { d(j) = cand; back(j) = l }
          }
        }
        l += 1
      }
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val l = back(p)
      val g = new String(cps, p - l, l)
      if (costs.contains(g)) out += g
      else if (byteFallback) byteMarkers(cps(p - 1)).reverseIterator.foreach(out += _)
      else out += g
      p -= l
    }
    (d(n) / 1024L, out.reverse.toSeq)
  }

  /** Inverse of the piece representation: byte markers reassemble
    * through a UTF-8 buffer (a multi-byte glyph's markers decode
    * together), literal pieces append as-is. `decode(viterbiPieces(w))
    * == w` is the tokenizer's integrity contract — what
    * `t_unigram_roundtrip` proves corpus-wide.
    */
  private[text] def decodePieces(pieces: Seq[String]): String = {
    val sb = new StringBuilder
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def flush(): Unit = if (buf.nonEmpty) {
      sb.append(new String(buf.toArray, java.nio.charset.StandardCharsets.UTF_8))
      buf.clear()
    }
    pieces.foreach { p =>
      if (p.length == 6 && p.startsWith("<0X") && p.endsWith(">"))
        buf += Integer.parseInt(p.substring(3, 5), 16).toByte
      else { flush(); sb.append(p) }
    }
    flush()
    sb.toString
  }

  /** decode(encode(x)) = x census for the unigram tokenizer WITH byte
    * fallback — the [[graft.text.Bpe.roundTripStats]] contract on the
    * tokenizer family that actually emits byte pieces: every token
    * segments via the Viterbi backtrace, decodes via the byte-marker
    * inverse, and must reconstruct exactly; cost/pieces totals come
    * from the SAME packed DP (the backtrace cannot drift from
    * [[viterbi]]'s counts), so the oracle recomputes them through the
    * unrolled-CTE DP and DECLARES the round-trip identity. Output:
    * `(id, n_tokens, cost_total, pieces_total, n_roundtrip)`.
    *
    * 100 TB shape: [[encodeCost]]'s — vocabulary-sized DP work,
    * corpus-sized census + broadcast join only.
    */
  def roundTripCensus(
      docs: DataFrame, idCol: String, textCol: String,
      maxGram: Int = 4, topV: Int = 200,
      byteFallback: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val census = Bpe.wordCensus(docs, textCol)
    val costs = vocabCosts(census, maxGram, topV)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = spark.sparkContext.broadcast(costs)
    val seg = census.select(col("word").cast("string")).as[String]
      .mapPartitions { it =>
        val m = b.value
        it.map { w =>
          // ONE DP per word: the backtrace supplies cost, count
          // (= pieces length, pinned equal to viterbi's in the spec),
          // and the decodable sequence
          val (c, pieces) = viterbiPieces(w, m, maxGram, byteFallback)
          val ok = decodePieces(pieces) == w
          (w, c, pieces.length.toLong, if (ok) 1L else 0L)
        }
      }
      .toDF("word", "cost", "pieces", "ok")
    docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .join(broadcast(seg), Seq("word"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("cost")).as("cost_total"),
        sum(col("pieces")).as("pieces_total"),
        sum(col("ok")).as("n_roundtrip"))
  }

  /** Oracle for [[roundTripCensus]]: [[encodeCostSql]]'s unrolled DP
    * recomputes `n_tokens`/`cost_total`/`pieces_total`, and
    * `n_roundtrip` is DECLARED equal to the token count — the
    * identity the Spark side proves by decoding the backtrace.
    */
  def roundTripCensusSql(
      whereClause: String, maxGram: Int = 4, topV: Int = 200,
      byteFallback: Boolean = true, textExpr: String = "text"): String =
    encodeCostSql(whereClause, maxGram, topV, byteFallback, textExpr)
      .replace(
        "CAST(sum(np) AS BIGINT) AS pieces_total",
        "CAST(sum(np) AS BIGINT) AS pieces_total,\n" +
          "  CAST(count(*) AS BIGINT) AS n_roundtrip")

  /** Segment every census word: `(word, cost, pieces)`. */
  def segmentCosts(
      census: DataFrame, maxGram: Int = 4, topV: Int = 200,
      byteFallback: Boolean = false): DataFrame = {
    val spark = census.sparkSession
    import spark.implicits._
    val costs = vocabCosts(census, maxGram, topV)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = spark.sparkContext.broadcast(costs)
    census.select(col("word").cast("string")).as[String]
      .mapPartitions { it =>
        val m = b.value
        it.map { w =>
          val (c, p) = viterbi(w, m, maxGram, byteFallback); (w, c, p)
        }
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
      maxGram: Int = 4, topV: Int = 200,
      byteFallback: Boolean = false): DataFrame = {
    val seg = segmentCosts(Bpe.wordCensus(docs, textCol), maxGram, topV,
      byteFallback)
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
      whereClause: String, maxGram: Int = 4, topV: Int = 200,
      byteFallback: Boolean = false, textExpr: String = "text"): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", s"lower($textExpr)")
    // edge increment (packed cost·1024 + pieces) for an OOV single:
    // UNK price, or its UTF-8 bytes under fallback (strlen = byte
    // count in DuckDB, vs length = code points)
    val oovInc =
      if (byteFallback) s"strlen(e.gram) * $ByteCost * 1024 + strlen(e.gram)"
      else s"CAST($Big AS BIGINT) * 1024 + 1"
    val longArm =
      if (byteFallback)
        s"SELECT word, strlen(word) * $ByteCost, strlen(word) FROM w"
      else s"SELECT word, length(word) * $Big, length(word) FROM w"
    val dp = (1 to MaxLen).map { j =>
      val arms = (1 to math.min(maxGram, j)).map { l =>
        s"""SELECT e.word, d.comb + e.inc AS comb
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
       |    CAST(CASE WHEN vc.cost IS NOT NULL THEN vc.cost * 1024 + 1
       |         ELSE $oovInc END AS BIGINT) AS inc
       |  FROM e LEFT JOIN vc ON vc.gram = e.gram
       |  WHERE vc.cost IS NOT NULL OR e.l = 1),
       |d0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS comb FROM words),
       |$dp,
       |dall AS ($dall),
       |seg AS (
       |  SELECT w.word, d.comb // 1024 AS cost, d.comb % 1024 AS np
       |  FROM words w JOIN dall d ON d.word = w.word AND d.j = w.n
       |  UNION ALL
       |  $longArm
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
