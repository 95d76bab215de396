package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring against a REFERENCE
  * corpus — the perplexity-filtering stage of LLM data pipelines
  * (CCNet trains a KenLM on trusted text and drops documents whose
  * perplexity is an outlier; this is the same signal computed from
  * add-one-smoothed n-gram counts, default bigram, trigram and up
  * via `order`). The reference project has no counterpart; this
  * extends SURVEY §2.5's text-analysis category beside
  * [[Ngrams.noveltyRate]] (which only tests set membership — this
  * weighs HOW unexpected each transition is).
  *
  * Log-free formulation, deliberately: `ln` is not IEEE-correctly-
  * rounded, so log-probabilities are not engine-exact. Instead each
  * n-gram occurrence `(w_1..w_n)` scores its inverse smoothed
  * conditional probability
  *
  *   surprise = 1 / P(w_n | w_1..w_{n-1})
  *            = (c(prefix) + V) / (c(gram) + 1)
  *
  * (add-one smoothing over the reference token vocabulary of size V)
  * — a strictly monotone transform of per-token perplexity, so
  * ranking and thresholding behave identically. `+`, `/`, `*` and
  * `floor` ARE correctly rounded, so quantizing each occurrence to
  * integer micro-units (`floor(surprise * 1e6)`) and summing as
  * BIGINT is bit-exact across engines ([[surpriseScoreSql]]); the
  * final mean is one IEEE division of exactly-representable
  * integers.
  *
  * Scale shape: the prefix and gram censuses are CORPUS-SIZED
  * (billions of rows at 100 TB) so both lookups are plain equi-joins
  * with NO forced broadcast — AQE picks the strategy; the vocabulary
  * size V is a 1-row aggregate that broadcasts. Text never shuffles:
  * documents explode to `(id, gram)` map-side (text projected away
  * first) and only grams and ids move. Quantization headroom: the
  * BIGINT sum overflows only past ~9e18 total micro-units per
  * document (c(prefix) ~ 1e12 at full web-crawl scale × 1e6 quantum
  * × doc length — at that point pass a smaller quantum).
  */
object Lm {

  /** The trained model: prefix census `(__w1, __c1)` over
    * `(order-1)`-grams, gram census `(__gram, __c12)` over
    * `order`-grams, and the 1-row token-vocabulary size `(__v)` —
    * train once, persist the censuses, score many batches/streams
    * ([[surpriseScoreAgainst]], [[graft.streaming.Streams]]'
    * `surpriseStream`). The reference feeds three lineages — by
    * default each re-scans the source; when the reference scan is
    * expensive pass `persistReference = true` (one MEMORY_AND_DISK
    * materialization of the token arrays; the entry lives until the
    * session drops it, same contract as [[TfIdf.topTerms]]'s
    * persistInput) or persist upstream yourself.
    */
  def referenceCensus(
      reference: DataFrame, refTextCol: String,
      persistReference: Boolean = false, order: Int = 2,
  ): (DataFrame, DataFrame, DataFrame) = {
    require(order >= 2, s"order $order must be >= 2")
    val refToks0 = reference
      .select(TextFunctions.tokens(lower(col(refTextCol))).as("__toks"))
    val refToks =
      if (persistReference)
        refToks0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else refToks0
    val prefix = refToks
      .select(explode(TextFunctions.allGramsOf(col("__toks"), order - 1))
        .as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__c1"))
    val grams = refToks
      .select(explode(TextFunctions.allGramsOf(col("__toks"), order))
        .as("__gram"))
      .groupBy("__gram").agg(count(lit(1)).as("__c12"))
    // token-vocabulary size: 1-row aggregate, broadcast via the cross
    // join. At order 2 the prefix census IS the token census, so its
    // row count serves; higher orders count distinct tokens directly.
    val vocabSize =
      if (order == 2) prefix.agg(count(lit(1)).as("__v"))
      else refToks.select(explode(col("__toks")).as("__w"))
        .agg(count_distinct(col("__w")).as("__v"))
    (prefix, grams, vocabSize)
  }

  /** Per-row n-gram explode + per-occurrence quantized surprise —
    * the shared core of the batch and streaming scorers (one body,
    * so stream ≡ batch can never drift). Input rows keep their
    * other columns; output adds `__gram` (null when the document
    * has < order tokens) and `__micro`.
    */
  private[graft] def scoredGrams(
      df: DataFrame, textCol: String,
      prefix: DataFrame, grams: DataFrame, vocabSize: DataFrame,
      order: Int = 2,
  ): DataFrame =
    df.withColumn("__gram",
        explode_outer(TextFunctions.allGramsOf(
          TextFunctions.tokens(lower(col(textCol))), order)))
      .drop(textCol) // project text away BEFORE the join shuffles
      .withColumn("__w1", substring_index(col("__gram"), " ", order - 1))
      .join(prefix, Seq("__w1"), "left")
      .join(grams, Seq("__gram"), "left")
      .crossJoin(broadcast(vocabSize))
      .withColumn("__micro",
        when(col("__gram").isNull, lit(null))
          .otherwise(floor(
            (coalesce(col("__c1"), lit(0L)) + col("__v")).cast("double") /
              (coalesce(col("__c12"), lit(0L)) + lit(1L)).cast("double") *
              lit(1e6))))

  /** Per-document surprise statistics for `df` against the model
    * trained on `reference`: `(idCol, n_grams, surprise_micro,
    * mean_surprise)` where `surprise_micro` is the BIGINT sum of the
    * quantized per-occurrence surprises (duplicates kept — they are
    * the signal) and `mean_surprise = surprise_micro / n_grams /
    * 1e6`. Documents with fewer than `order` tokens have zero grams
    * and mean `0.0`. Tokenization is the library rule: lowercased,
    * whitespace-split. Prefixes unseen in the reference have
    * `c(prefix) = 0` and score `V / (0 + 1)` — the uniform-model
    * maximum, as smoothing dictates.
    */
  def surpriseScore(
      df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      persistReference: Boolean = false, order: Int = 2,
  ): DataFrame = {
    val (prefix, grams, vocabSize) =
      referenceCensus(reference, refTextCol, persistReference, order)
    surpriseScoreAgainst(df, idCol, textCol, prefix, grams, vocabSize, order)
  }

  /** [[surpriseScore]] against an already-trained model (the frames
    * [[referenceCensus]] returns, typically persisted or reloaded
    * from parquet). `order` must match the census order.
    */
  def surpriseScoreAgainst(
      df: DataFrame, idCol: String, textCol: String,
      prefix: DataFrame, grams: DataFrame, vocabSize: DataFrame,
      order: Int = 2,
  ): DataFrame = {
    Seq("__gram", "__w1", "__c1", "__c12", "__v").foreach(c =>
      require(!df.columns.contains(c),
        s"surpriseScore reserves column name $c; rename it in the input"))
    val scored = scoredGrams(df.select(col(idCol), col(textCol)), textCol,
      prefix, grams, vocabSize, order)
    scored.groupBy(col(idCol))
      .agg(count(col("__gram")).cast("int").as("n_grams"),
        coalesce(sum(col("__micro")), lit(0L)).as("surprise_micro"))
      .withColumn("mean_surprise",
        when(col("n_grams") > 0,
          col("surprise_micro").cast("double") /
            col("n_grams").cast("double") / lit(1e6))
          .otherwise(lit(0.0)))
  }

  /** Contrastive (target-vs-source) selection score — the
    * targeted-data-selection step (DSIR-style: keep documents that
    * look like the TARGET distribution and unlike the generic
    * SOURCE; Xie et al. 2023 weight by a log-probability ratio —
    * this is the library's log-free surrogate, the DIFFERENCE of the
    * two models' quantized surprise sums, positive when the target
    * model finds the document less surprising than the source model
    * does). All-integer once past the per-occurrence quantization:
    * `contrast_micro = src_micro − tgt_micro` is BIGINT arithmetic
    * on exact sums, so the ranking is engine-exact with no further
    * quantization. Output: `(idCol, n_grams, src_micro, tgt_micro,
    * contrast_micro)`; rank by `(contrast_micro desc, id)` and keep
    * a prefix (or feed [[graft.ops.Selection.selectToBudget]] with
    * the contrast as the score) to materialize the selection.
    *
    * Scale shape: two independent surprise scorings (each the
    * census-join topology documented on [[surpriseScore]]) joined on
    * the document id — both sides doc-keyed, one id shuffle.
    */
  def contrastiveScore(
      df: DataFrame, idCol: String, textCol: String,
      targetRef: DataFrame, sourceRef: DataFrame, refTextCol: String,
      persistReference: Boolean = false, order: Int = 2,
  ): DataFrame = {
    val tgt = surpriseScore(df, idCol, textCol, targetRef, refTextCol,
        persistReference, order)
      .select(col(idCol), col("n_grams"), col("surprise_micro").as("tgt_micro"))
    val src = surpriseScore(df, idCol, textCol, sourceRef, refTextCol,
        persistReference, order)
      .select(col(idCol), col("surprise_micro").as("src_micro"))
    tgt.join(src, Seq(idCol))
      .select(col(idCol), col("n_grams"), col("src_micro"), col("tgt_micro"),
        (col("src_micro") - col("tgt_micro")).as("contrast_micro"))
  }

  /** DuckDB rendering of [[contrastiveScore]] over `documents`. */
  def contrastiveScoreSql(
      whereClause: String, targetWhere: String, sourceWhere: String,
      order: Int = 2,
  ): String =
    s"""SELECT a.doc_id, a.n_grams,
       |  b.surprise_micro AS src_micro,
       |  a.surprise_micro AS tgt_micro,
       |  CAST(b.surprise_micro - a.surprise_micro AS BIGINT)
       |    AS contrast_micro
       |FROM (${surpriseScoreSql(whereClause, targetWhere, order)}) a
       |JOIN (${surpriseScoreSql(whereClause, sourceWhere, order)}) b
       |  USING (doc_id)""".stripMargin

  /** Kneser-Ney smoothed bigram surprise — the smoothing real n-gram
    * LM filters actually ship (add-one overweights unseen grams
    * badly; KN discounts observed counts by `d = 0.75` and backs off
    * to the CONTINUATION probability, "how many distinct contexts
    * does this word follow", which is why it famously scores
    * "francisco" low despite high raw frequency):
    *
    *   P_KN(w2|w1) = (max(c(w1,w2) − d, 0) + d·N1+(w1,·)·P_cont(w2)) / c(w1)
    *   P_cont(w2)  = (N1+(·,w2) + 1) / (N_types + V)
    *
    * with full backoff to `P_cont` when the prefix is unseen, and
    * add-one on the continuation census so unseen continuations stay
    * finite (the same escape-hatch role V plays in [[surpriseScore]]).
    * Engine-exactness carries over verbatim: `d = 0.75` is binary-
    * exact, every count is an integer, the op order is pinned in
    * both renderings, and each occurrence quantizes to
    * `floor(1e6 / P_KN)` before the BIGINT sum.
    *
    * Scale shape: ALL the extra censuses (N1+ left/right, N_types)
    * derive from the gram census — census-sized aggregations, not
    * corpus rescans; the scoring joins are the [[surpriseScore]]
    * topology plus one more census-keyed left join. Output:
    * `(idCol, n_grams, kn_micro, mean_kn)`.
    */
  def kneserNeyScore(
      df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      persistReference: Boolean = false,
  ): DataFrame = {
    Seq("__gram", "__w1", "__w2", "__c1", "__c12", "__v", "__n1pw",
      "__n1pc", "__nt").foreach(c =>
      require(!df.columns.contains(c),
        s"kneserNeyScore reserves column name $c; rename it in the input"))
    val (_, grams, vocabSize) =
      referenceCensus(reference, refTextCol, persistReference, order = 2)
    // KN's context total is Σ_w2 c(w1,w2) — tokens in PREFIX position
    // only, NOT the raw unigram count (which includes document-final
    // tokens and would deflate every conditional; the fuzz harness
    // caught exactly this divergence). Derived from the gram census
    // in the same pass as N1+(w1,·).
    val ctx = grams
      .select(substring_index(col("__gram"), " ", 1).as("__w1"), col("__c12"))
      .groupBy("__w1")
      .agg(sum(col("__c12")).as("__c1"), count(lit(1)).as("__n1pw"))
    val n1pc = grams
      .select(substring_index(col("__gram"), " ", -1).as("__w2"))
      .groupBy("__w2").agg(count(lit(1)).as("__n1pc"))
    val ntypes = grams.agg(count(lit(1)).as("__nt"))
    val scored = df.select(col(idCol), col(textCol))
      .withColumn("__gram",
        explode_outer(TextFunctions.allGramsOf(
          TextFunctions.tokens(lower(col(textCol))), 2)))
      .drop(textCol)
      .withColumn("__w1", substring_index(col("__gram"), " ", 1))
      .withColumn("__w2", substring_index(col("__gram"), " ", -1))
      .join(ctx, Seq("__w1"), "left")
      .join(grams, Seq("__gram"), "left")
      .join(n1pc, Seq("__w2"), "left")
      .crossJoin(broadcast(ntypes))
      .crossJoin(broadcast(vocabSize))
    // op order pinned against kneserNeySql — change BOTH or neither
    val pcont = (coalesce(col("__n1pc"), lit(0L)) + lit(1L)).cast("double") /
      (col("__nt") + col("__v")).cast("double")
    val disc = greatest(
      coalesce(col("__c12"), lit(0L)).cast("double") - lit(0.75), lit(0.0))
    val pkn = when(coalesce(col("__c1"), lit(0L)) > 0,
      (disc + (lit(0.75) * coalesce(col("__n1pw"), lit(0L)).cast("double"))
        * pcont) / col("__c1").cast("double"))
      .otherwise(pcont)
    scored
      .withColumn("__micro",
        when(col("__gram").isNull, lit(null))
          .otherwise(floor(lit(1e6) / pkn)))
      .groupBy(col(idCol))
      .agg(count(col("__gram")).cast("int").as("n_grams"),
        coalesce(sum(col("__micro")), lit(0L)).as("kn_micro"))
      .withColumn("mean_kn",
        when(col("n_grams") > 0,
          col("kn_micro").cast("double") /
            col("n_grams").cast("double") / lit(1e6))
          .otherwise(lit(0.0)))
  }

  /** DuckDB rendering of [[kneserNeyScore]] over `documents(doc_id,
    * text)`.
    */
  def kneserNeySql(whereClause: String, refWhereClause: String): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val grams = TextFunctions.allGramsSql("toks", 2)
    s"""WITH rt AS (SELECT $toks AS toks FROM documents $refWhereClause),
       |gc AS (SELECT gram, count(*) AS c12
       |  FROM (SELECT unnest($grams) AS gram FROM rt) GROUP BY gram),
       |pc AS (SELECT string_split(gram, ' ')[1] AS w1,
       |    CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1pw
       |  FROM gc GROUP BY 1),
       |nc AS (SELECT string_split(gram, ' ')[-1] AS w2, count(*) AS n1pc
       |  FROM gc GROUP BY 1),
       |nt AS (SELECT count(*) AS nt FROM gc),
       |v AS (SELECT count(DISTINCT w) AS v
       |  FROM (SELECT unnest(toks) AS w FROM rt)),
       |dt AS (SELECT doc_id, $toks AS toks FROM documents $whereClause),
       |dg AS (SELECT doc_id, gram,
       |    string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[-1] AS w2
       |  FROM (SELECT doc_id, unnest($grams) AS gram FROM dt)),
       |sc AS (SELECT dg.doc_id,
       |    CAST(floor(1e6 / (
       |      CASE WHEN coalesce(pc.c1, 0) > 0
       |      THEN (greatest(CAST(coalesce(gc.c12, 0) AS DOUBLE) - 0.75, 0.0)
       |            + (0.75 * CAST(coalesce(pc.n1pw, 0) AS DOUBLE))
       |              * (CAST(coalesce(nc.n1pc, 0) + 1 AS DOUBLE)
       |                 / CAST(nt.nt + v.v AS DOUBLE)))
       |           / CAST(pc.c1 AS DOUBLE)
       |      ELSE CAST(coalesce(nc.n1pc, 0) + 1 AS DOUBLE)
       |           / CAST(nt.nt + v.v AS DOUBLE) END)) AS BIGINT) AS micro
       |  FROM dg
       |  LEFT JOIN pc ON dg.w1 = pc.w1
       |  LEFT JOIN gc ON dg.gram = gc.gram
       |  LEFT JOIN nc ON dg.w2 = nc.w2
       |  CROSS JOIN nt CROSS JOIN v),
       |c AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
       |    sum(micro) AS n_micro
       |  FROM sc GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(c.n_grams, 0) AS n_grams,
       |  CAST(coalesce(c.n_micro, 0) AS BIGINT) AS kn_micro,
       |  CASE WHEN coalesce(c.n_grams, 0) > 0
       |    THEN CAST(c.n_micro AS DOUBLE) / CAST(c.n_grams AS DOUBLE) / 1e6
       |    ELSE 0.0 END AS mean_kn
       |FROM (SELECT doc_id FROM documents $whereClause) d
       |LEFT JOIN c USING (doc_id)""".stripMargin
  }

  /** Stupid-backoff scoring (Brants et al. 2007 — the deliberately
    * unnormalized rule the web-scale Google LMs shipped, because at
    * large counts it tracks Kneser-Ney at a fraction of the cost):
    *
    *   S(w2 | w1) = c(w1,w2) / c(w1)              if c(w1,w2) > 0
    *              = 0.4 · (c(w2) + 1) / (N + V)   otherwise
    *
    * with `c(w1)` the PREFIX-position total (Σ_w2 c(w1,w2) — the
    * kneserNeyScore lesson), `c(w2)` the raw unigram count, `N` the
    * reference token total, and add-one on the backoff arm so the
    * score is total over unseen words (the one tweak vs the paper,
    * which lets unseen unigrams score 0). Emitted as the library's
    * standard inverse-score micro-units (`floor(1e6 / S)`, summed as
    * BIGINT); every double op is a pinned, correctly-rounded
    * sequence, so the whole scorer hash-gates. Same plan shape as
    * [[surpriseScore]]: censuses join on gram keys, the two scalars
    * broadcast, text never shuffles.
    */
  def stupidBackoffScore(
      df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      persistReference: Boolean = false,
  ): DataFrame = {
    Seq("__gram", "__w1", "__w2", "__c1", "__c12", "__cw2", "__v", "__n")
      .foreach(c => require(!df.columns.contains(c),
        s"stupidBackoffScore reserves column name $c; rename it in the input"))
    val (uni, grams, vocabSize) =
      referenceCensus(reference, refTextCol, persistReference, order = 2)
    val ctx = grams
      .select(substring_index(col("__gram"), " ", 1).as("__w1"), col("__c12"))
      .groupBy("__w1").agg(sum(col("__c12")).as("__c1"))
    val w2c = uni.select(col("__w1").as("__w2"), col("__c1").as("__cw2"))
    val nTotal = uni.agg(sum(col("__c1")).as("__n"))
    val scored = df.select(col(idCol), col(textCol))
      .withColumn("__gram",
        explode_outer(TextFunctions.allGramsOf(
          TextFunctions.tokens(lower(col(textCol))), 2)))
      .drop(textCol)
      .withColumn("__w1", substring_index(col("__gram"), " ", 1))
      .withColumn("__w2", substring_index(col("__gram"), " ", -1))
      .join(ctx, Seq("__w1"), "left")
      .join(grams, Seq("__gram"), "left")
      .join(w2c, Seq("__w2"), "left")
      .crossJoin(broadcast(nTotal))
      .crossJoin(broadcast(vocabSize))
    // op order pinned against stupidBackoffSql — change BOTH or neither
    val sb = when(coalesce(col("__c12"), lit(0L)) > 0,
      col("__c12").cast("double") / col("__c1").cast("double"))
      .otherwise(lit(0.4) *
        (coalesce(col("__cw2"), lit(0L)) + lit(1L)).cast("double") /
        (col("__n") + col("__v")).cast("double"))
    scored
      .withColumn("__micro",
        when(col("__gram").isNull, lit(null))
          .otherwise(floor(lit(1e6) / sb)))
      .groupBy(col(idCol))
      .agg(count(col("__gram")).cast("int").as("n_grams"),
        coalesce(sum(col("__micro")), lit(0L)).as("sb_micro"))
      .withColumn("mean_sb",
        when(col("n_grams") > 0,
          col("sb_micro").cast("double") /
            col("n_grams").cast("double") / lit(1e6))
          .otherwise(lit(0.0)))
  }

  /** DuckDB rendering of [[stupidBackoffScore]] over
    * `documents(doc_id, text)`.
    */
  def stupidBackoffSql(whereClause: String, refWhereClause: String): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val grams = TextFunctions.allGramsSql("toks", 2)
    s"""WITH rt AS (SELECT $toks AS toks FROM documents $refWhereClause),
       |uc AS (SELECT w, count(*) AS cw
       |  FROM (SELECT unnest(toks) AS w FROM rt) GROUP BY w),
       |gc AS (SELECT gram, count(*) AS c12
       |  FROM (SELECT unnest($grams) AS gram FROM rt) GROUP BY gram),
       |pc AS (SELECT string_split(gram, ' ')[1] AS w1,
       |    CAST(sum(c12) AS BIGINT) AS c1 FROM gc GROUP BY 1),
       |n AS (SELECT CAST(SUM(cw) AS BIGINT) AS n FROM uc),
       |v AS (SELECT count(*) AS v FROM uc),
       |dt AS (SELECT doc_id, $toks AS toks FROM documents $whereClause),
       |dg AS (SELECT doc_id, gram,
       |    string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[-1] AS w2
       |  FROM (SELECT doc_id, unnest($grams) AS gram FROM dt)),
       |sc AS (SELECT dg.doc_id,
       |    CAST(floor(1e6 / (
       |      CASE WHEN coalesce(gc.c12, 0) > 0
       |      THEN CAST(gc.c12 AS DOUBLE) / CAST(pc.c1 AS DOUBLE)
       |      ELSE 0.4 * CAST(coalesce(uc.cw, 0) + 1 AS DOUBLE)
       |           / CAST(n.n + v.v AS DOUBLE) END)) AS BIGINT) AS micro
       |  FROM dg
       |  LEFT JOIN pc ON dg.w1 = pc.w1
       |  LEFT JOIN gc ON dg.gram = gc.gram
       |  LEFT JOIN uc ON dg.w2 = uc.w
       |  CROSS JOIN n CROSS JOIN v),
       |c AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
       |    sum(micro) AS n_micro
       |  FROM sc GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(c.n_grams, 0) AS n_grams,
       |  CAST(coalesce(c.n_micro, 0) AS BIGINT) AS sb_micro,
       |  CASE WHEN coalesce(c.n_grams, 0) > 0
       |    THEN CAST(c.n_micro AS DOUBLE) / CAST(c.n_grams AS DOUBLE) / 1e6
       |    ELSE 0.0 END AS mean_sb
       |FROM (SELECT doc_id FROM documents $whereClause) d
       |LEFT JOIN c USING (doc_id)""".stripMargin
  }

  /** DuckDB rendering of [[surpriseScore]] over `documents(doc_id,
    * text)`: score the documents matching `whereClause` against the
    * model trained on documents matching `refWhereClause` (full
    * `WHERE ...` clauses or "").
    */
  def surpriseScoreSql(
      whereClause: String, refWhereClause: String, order: Int = 2,
      from: String = "documents",
  ): String = {
    require(order >= 2, s"order $order must be >= 2")
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val pGrams = TextFunctions.allGramsSql("toks", order - 1)
    val grams = TextFunctions.allGramsSql("toks", order)
    val prefixOf =
      s"array_to_string((string_split(gram, ' '))[1:${order - 1}], ' ')"
    s"""WITH rt AS (SELECT $toks AS toks FROM $from $refWhereClause),
       |pc AS (SELECT w1, count(*) AS c1
       |  FROM (SELECT unnest($pGrams) AS w1 FROM rt) GROUP BY w1),
       |gc AS (SELECT gram, count(*) AS c12
       |  FROM (SELECT unnest($grams) AS gram FROM rt) GROUP BY gram),
       |v AS (SELECT count(DISTINCT w) AS v
       |  FROM (SELECT unnest(toks) AS w FROM rt)),
       |dt AS (SELECT doc_id, $toks AS toks FROM $from $whereClause),
       |dg AS (SELECT doc_id, gram, $prefixOf AS w1
       |  FROM (SELECT doc_id, unnest($grams) AS gram FROM dt)),
       |sc AS (SELECT dg.doc_id, dg.gram,
       |    CAST(floor(CAST(coalesce(pc.c1, 0) + v.v AS DOUBLE)
       |      / CAST(coalesce(gc.c12, 0) + 1 AS DOUBLE) * 1e6) AS BIGINT)
       |      AS micro
       |  FROM dg
       |  LEFT JOIN pc ON dg.w1 = pc.w1
       |  LEFT JOIN gc ON dg.gram = gc.gram
       |  CROSS JOIN v),
       |c AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
       |    sum(micro) AS n_micro
       |  FROM sc GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(c.n_grams, 0) AS n_grams,
       |  CAST(coalesce(c.n_micro, 0) AS BIGINT) AS surprise_micro,
       |  CASE WHEN coalesce(c.n_grams, 0) > 0
       |    THEN CAST(c.n_micro AS DOUBLE) / CAST(c.n_grams AS DOUBLE) / 1e6
       |    ELSE 0.0 END AS mean_surprise
       |FROM (SELECT doc_id FROM $from $whereClause) d
       |LEFT JOIN c USING (doc_id)""".stripMargin
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, §4.4: score
    * every document with a reference language model and split EACH
    * LANGUAGE into head/middle/tail perplexity terciles — the recipe
    * behind "keep head+middle, drop tail" web-corpus curation). The
    * per-doc key is the INTEGER mean quantized surprise
    * (`surprise_micro div n_grams` — both operands non-negative, so
    * Spark's truncating `div` and SQL's flooring `//` agree), ranked
    * `(key, id)` inside a per-language ntile(3) window — partitioned,
    * never a global sort. Zero-gram documents are excluded (CCNet
    * drops empties before bucketing). Output: one census row per
    * `(lang, bucket)` — `(lang, bucket, n_docs, min_ppl_micro,
    * max_ppl_micro)`, bucket ∈ head/middle/tail — the numbers a
    * curation run reads to place its keep-threshold. To materialize
    * the kept set, filter the bucketed frame instead of the census
    * (same window, `bin <= 2`).
    *
    * 100 TB shape: the model censuses are corpus-sized equi-joins
    * (no forced broadcast, text projected away before any shuffle —
    * the [[surpriseScore]] plan), the lang lookup is an id-keyed
    * equi-join, and the tercile window partitions by language.
    */
  def pplBuckets(
      df: DataFrame, idCol: String, textCol: String, langCol: String,
      reference: DataFrame, refTextCol: String, order: Int = 2,
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = surpriseScore(df, idCol, textCol, reference, refTextCol,
      order = order)
      .filter(col("n_grams") > 0)
      .select(col(idCol), expr("surprise_micro div n_grams").as("ppl_key"))
    val keyed = scored.join(df.select(col(idCol), col(langCol).as("lang")),
      Seq(idCol))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("ppl_key"), col(idCol))
    keyed.withColumn("bin", ntile(3).over(w))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("ppl_key")).as("min_ppl_micro"),
        max(col("ppl_key")).as("max_ppl_micro"))
      .select(col("lang"),
        when(col("bin") === 1, lit("head"))
          .when(col("bin") === 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"),
        col("n_docs"), col("min_ppl_micro"), col("max_ppl_micro"))
  }

  /** DuckDB rendering of [[pplBuckets]] over `documents(doc_id, text,
    * lang)` — the [[surpriseScoreSql]] body nested as a CTE, the same
    * integer key, the same per-language ntile.
    */
  def pplBucketsSql(
      whereClause: String, refWhereClause: String, order: Int = 2,
  ): String =
    s"""WITH s AS (${surpriseScoreSql(whereClause, refWhereClause, order)}),
       |k AS (SELECT d.lang, s.doc_id, s.surprise_micro // s.n_grams AS ppl_key
       |  FROM s JOIN documents d USING (doc_id) WHERE s.n_grams > 0),
       |b AS (SELECT lang, doc_id, ppl_key,
       |    ntile(3) OVER (PARTITION BY lang ORDER BY ppl_key, doc_id) AS bin
       |  FROM k)
       |SELECT lang,
       |  CASE bin WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
       |    ELSE 'tail' END AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(min(ppl_key) AS BIGINT) AS min_ppl_micro,
       |  CAST(max(ppl_key) AS BIGINT) AS max_ppl_micro
       |FROM b GROUP BY lang, bin
       |ORDER BY lang, bin""".stripMargin

  /** SoftDeDup (Hu et al. 2024) — soft deduplication by REWEIGHTING
    * instead of removal: measure each document's "data commonness"
    * under the corpus' own n-gram distribution and give common
    * (duplicated/boilerplate-heavy) documents a LOWER sampling
    * weight, rare documents a higher one, with a floor so nothing is
    * hard-dropped — the paper's case against hard dedup is exactly
    * that removal throws away the re-weighted signal.
    *
    * The commonness proxy is the corpus-as-its-own-reference
    * [[surpriseScore]]: per-gram surprise `(c(prefix)+V)/(c(gram)+1)`
    * is monotone in `1/P(gram | corpus)`, so the per-doc INTEGER mean
    * quantized surprise (`surprise_micro div n_grams`, the
    * [[pplBuckets]] key) is a rarity score — high for documents the
    * corpus model finds improbable, low for ones assembled from the
    * corpus' most-repeated grams. Weights normalize that rarity to
    * mean ≈ 1e6 ppm over the scored corpus and clamp below at
    * `minWeightPpm`:
    *
    *   weight_ppm = max(minWeightPpm, (rarity_micro * 1e6) div mean_rarity)
    *
    * All-integer past the per-occurrence quantization: the mean is a
    * BIGINT floor division of a 1-row global aggregate (broadcast,
    * the q11 scalar pattern), and both engines floor the same
    * non-negative operands (`div` truncates, `//` floors — equal on
    * non-negatives). Overflow headroom: `rarity_micro * 1e6` caps at
    * ~`V * 1e12` (surprise is at most `V+max(c1)` per gram), so a
    * 1e6-token vocabulary still sits 6 orders under Long.MaxValue;
    * the global rarity SUM wraps past ~9e18 total micro-units
    * (`n_docs × mean_rarity`) — past that, lower the quantum (the
    * same dial the header documents for [[surpriseScore]]).
    * Zero-gram documents are excluded (no grams → no commonness
    * evidence; the caller decides their fate upstream).
    *
    * Output: `(idCol, rarity_micro, weight_ppm)`. Downstream, feed
    * `weight_ppm` to the weighted samplers ([[graft.ops.Mixture]])
    * or multiply into a per-doc sampling probability.
    *
    * 100 TB shape: one self-referenced surprise scoring — the
    * corpus-sized census equi-joins of [[surpriseScore]] (no forced
    * broadcast, text projected away before any shuffle) — plus one
    * 1-row global aggregate broadcast back over the doc-keyed frame.
    * Nothing new shuffles at corpus scale. The self-reference feeds
    * FOUR lineages (two censuses, the vocab scalar, the doc grams)
    * and the mean branch re-embeds the whole rarity lineage, so by
    * default the source is re-scanned per lineage; when that scan is
    * expensive pass `persistInput = true` — one MEMORY_AND_DISK
    * materialization of the reference token arrays (the
    * [[referenceCensus]] `persistReference` loan) plus one of the
    * doc-keyed rarity frame, after which every lineage reads a cache
    * (the [[TfIdf.topTerms]] persistInput contract: entries live
    * until the session drops them).
    */
  def softDedupWeights(
      df: DataFrame, idCol: String, textCol: String,
      order: Int = 2, minWeightPpm: Long = 100000L,
      persistInput: Boolean = false,
  ): DataFrame = {
    require(minWeightPpm >= 0, s"minWeightPpm $minWeightPpm must be >= 0")
    val rarity0 = surpriseScore(df, idCol, textCol, df, textCol,
        persistReference = persistInput, order = order)
      .filter(col("n_grams") > 0)
      .select(col(idCol), expr("surprise_micro div n_grams").as("rarity_micro"))
    val rarity =
      if (persistInput)
        rarity0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else rarity0
    val mean = rarity
      .agg(expr("sum(rarity_micro) div count(1)").as("__mean_rarity"))
    rarity.crossJoin(broadcast(mean))
      .select(col(idCol), col("rarity_micro"),
        greatest(
          expr("(rarity_micro * 1000000L) div __mean_rarity"),
          lit(minWeightPpm)).as("weight_ppm"))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023) — the
    * published recipe trains a proxy under Group DRO and runs
    * multiplicative weights on per-domain EXCESS LOSS
    * (`w'_d ∝ w_d · exp(η · excess_d)`), then smooths toward
    * uniform. This operator is the engine-exact ONE-ROUND,
    * FIRST-ORDER surrogate of that step, from a uniform baseline:
    *
    *   excess_d  = Σ contrast_micro / Σ n_grams   (per-gram integer
    *               mean of the [[contrastiveScore]] target-vs-source
    *               excess — positive where the target model finds
    *               the domain less surprising than the source model)
    *   factor_d  = max(1e6 + (etaPpm · excess_d) div 1e6, floorPpm)
    *               (exp(ηx) ≈ 1 + ηx — the small-η regime;
    *               `floorPpm` keeps a very source-like domain from
    *               zeroing out, DoReMi's smoothing motive)
    *   w_ppm_d   = ((1e6 − smoothingPpm) · ((factor_d · 1e6) div
    *               Σ factor)) div 1e6 + smoothingPpm div K
    *
    * All BIGINT once past the per-occurrence quantization. The
    * excess and the η product can be NEGATIVE (source-like domains)
    * — verified safe: on INTEGER operands both Spark's `div` and
    * DuckDB's `//` truncate toward zero (DuckDB floors only for
    * floats), so plain integer division stays engine-exact at every
    * sign. Both engines produce identical weights; Σ w ≈ 1e6 up to
    * flooring. The deliberate deviations from the paper — one round
    * instead of trained-proxy iteration, linear instead of
    * exponential update — are what keep the step oracle-exact; the
    * iteration is the caller's loop (re-fit the reference censuses
    * on the reweighted mix and call again).
    *
    * Output: `(domain, n_docs, excess_micro, weight_ppm)` — one row
    * per domain. 100 TB shape: the two census scorings of
    * [[contrastiveScore]] (corpus-sized equi-joins, no forced
    * broadcast), one id-keyed join to recover the domain, one
    * #domains-sized aggregate, and a 1-row total broadcast back over
    * it. Nothing new shuffles at corpus scale.
    */
  def doremiDomainWeights(
      df: DataFrame, idCol: String, textCol: String, domainCol: String,
      targetRef: DataFrame, sourceRef: DataFrame, refTextCol: String,
      etaPpm: Long = 500000L, floorPpm: Long = 100000L,
      smoothingPpm: Long = 10000L, order: Int = 2,
  ): DataFrame = {
    require(etaPpm >= 0 && floorPpm >= 0 && smoothingPpm >= 0 &&
      smoothingPpm <= 1000000L,
      s"bad dials: eta=$etaPpm floor=$floorPpm smoothing=$smoothingPpm")
    val scored = contrastiveScore(df, idCol, textCol, targetRef, sourceRef,
        refTextCol, order = order)
      .join(df.select(col(idCol), col(domainCol).as("domain")), Seq(idCol))
    val dom = scored.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(contrast_micro) div greatest(sum(n_grams), 1L)")
          .as("excess_micro"))
      .withColumn("__factor",
        greatest(lit(1000000L) +
          expr(s"($etaPpm * excess_micro) div 1000000L"),
          lit(floorPpm)))
    val tot = dom.agg(sum(col("__factor")).as("__tot"),
      count(lit(1)).as("__k"))
    dom.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"), col("excess_micro"),
        (expr(s"((1000000L - $smoothingPpm) * " +
          s"((__factor * 1000000L) div __tot)) div 1000000L") +
          expr(s"$smoothingPpm div __k")).as("weight_ppm"))
  }

  /** DuckDB rendering of [[doremiDomainWeights]] over
    * `documents(doc_id, text, source)` — the contrastive CTE, the
    * same integer update and normalization.
    */
  def doremiDomainWeightsSql(
      whereClause: String, targetWhere: String, sourceWhere: String,
      domainCol: String = "source",
      etaPpm: Long = 500000L, floorPpm: Long = 100000L,
      smoothingPpm: Long = 10000L, order: Int = 2,
  ): String =
    s"""WITH cs AS (${contrastiveScoreSql(whereClause, targetWhere,
          sourceWhere, order)}),
       |dj AS (SELECT d.$domainCol AS domain, cs.n_grams,
       |    cs.contrast_micro
       |  FROM cs JOIN documents d USING (doc_id)),
       |dm AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(contrast_micro) // greatest(sum(n_grams), 1)
       |      AS BIGINT) AS excess_micro
       |  FROM dj GROUP BY domain),
       |f AS (SELECT domain, n_docs, excess_micro,
       |    greatest(1000000 + ($etaPpm * excess_micro) // 1000000,
       |      $floorPpm) AS factor
       |  FROM dm),
       |t AS (SELECT CAST(sum(factor) AS BIGINT) AS tot,
       |    CAST(count(*) AS BIGINT) AS k FROM f)
       |SELECT f.domain, f.n_docs, f.excess_micro,
       |  CAST(((1000000 - $smoothingPpm) *
       |      ((f.factor * 1000000) // t.tot)) // 1000000 +
       |    $smoothingPpm // t.k AS BIGINT) AS weight_ppm
       |FROM f CROSS JOIN t""".stripMargin

  /** DuckDB rendering of [[softDedupWeights]] — the
    * [[surpriseScoreSql]] body as the self-referenced census (same
    * WHERE on both roles), the same integer mean and clamp. `from`
    * is the source relation exposing `(doc_id, text)` (a table name
    * or a parenthesized subquery for pipeline compositions).
    */
  def softDedupWeightsSql(
      whereClause: String, order: Int = 2, minWeightPpm: Long = 100000L,
      from: String = "documents",
  ): String =
    s"""WITH s AS (${surpriseScoreSql(whereClause, whereClause, order, from)}),
       |r AS (SELECT doc_id, surprise_micro // n_grams AS rarity_micro
       |  FROM s WHERE n_grams > 0),
       |m AS (SELECT CAST(sum(rarity_micro) // count(*) AS BIGINT)
       |    AS mean_rarity FROM r)
       |SELECT r.doc_id,
       |  CAST(r.rarity_micro AS BIGINT) AS rarity_micro,
       |  CAST(greatest((r.rarity_micro * 1000000) // m.mean_rarity,
       |    $minWeightPpm) AS BIGINT) AS weight_ppm
       |FROM r CROSS JOIN m""".stripMargin
}
