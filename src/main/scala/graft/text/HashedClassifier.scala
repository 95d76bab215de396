package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Hashing-trick linear classifier INFERENCE — the fastText-shaped
  * quality-filter stage (CCNet/RefinedWeb/FineWeb all gate documents
  * through a linear model over hashed n-gram features): each document
  * becomes a bag of unigram+bigram features, each feature hashes into
  * one of `buckets` weight slots (collisions and all — that IS the
  * hashing trick), and the document scores as the mean bucket weight.
  * Map-only feature extraction, one doc-keyed aggregation: the
  * exact shape a 100 TB corpus filter needs (the weight table stays
  * a fixed-size array regardless of vocabulary growth).
  *
  * The weight table here is a deterministic md5-derived stand-in
  * (integer micro-weights in [-1000, 1000] keyed by bucket id) — a
  * TRAINED model would broadcast its real table and the plan shape
  * would not change. Everything else (tokenization, bigram
  * construction, bucket hashing, aggregation) is the production
  * path, and the whole pipeline is engine-exact: integer census
  * (`n_grams`, `w_sum`) plus ONE final IEEE division for the mean,
  * so the score double hashes raw. The logistic link is omitted
  * deliberately — `exp` is not correctly rounded (engine-divergent)
  * and sigmoid is monotone, so thresholding on the mean weight is
  * equivalent.
  */
object HashedClassifier {

  /** Unigram + adjacent-bigram feature array of a token array. */
  private def grams(toks: Column): Column = {
    val n = size(toks)
    val bigrams = when(n >= 2,
      zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (a, b) => concat(a, lit("_"), b)))
      .otherwise(array().cast("array<string>"))
    concat(toks, bigrams)
  }

  /** Weight-slot id of a feature: md5 bucket in [0, buckets). */
  def bucket(gram: Column, buckets: Int): Column =
    Sketches.kmvHash(gram) % buckets

  /** Deterministic stand-in weight of a bucket: micro-units in
    * [-1000, 1000], md5-keyed on the bucket id.
    */
  def bucketWeight(bucket: Column): Column =
    Sketches.kmvHash(concat(lit("w:"), bucket.cast("string"))) % 2001 - 1000

  /** Per-gram weight rows — the shared core of the batch scorer and
    * the streaming twin (one body, so stream ≡ batch can never
    * drift). Input rows keep their other columns; each input row
    * explodes to one row per feature with its bucket weight `__w`.
    */
  private[graft] def gramWeights(
      df: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets $buckets must be positive")
    df.withColumn("__g",
        explode(grams(TextFunctions.tokens(lower(col(textCol))))))
      .drop(textCol)
      .withColumn("__w", bucketWeight(bucket(col("__g"), buckets)))
  }

  /** Per-document score: `(id, n_grams, w_sum, score)` where `score`
    * = mean bucket weight in micro-units. Documents with no tokens
    * are absent (no features → nothing to score; filter-stage
    * consumers treat missing as rejected).
    */
  def score(
      df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096): DataFrame =
    gramWeights(df.select(col(idCol).as("id"), col(textCol)),
        textCol, buckets)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("__w")).as("w_sum"))
      .select(col("id"), col("n_grams"), col("w_sum"),
        (col("w_sum").cast("double") / col("n_grams").cast("double"))
          .as("score"))

  // ---- trainer: weights from a labeled census (round 13) ----

  /** TRAINS the weight table from a labeled slice — the fastText-
    * pipeline shape real curation stacks run (label a small slice,
    * train a cheap linear model, filter the corpus with it). The
    * model is an all-integer difference of add-one-smoothed
    * class-conditional bucket rates (the Rocchio/centroid member of
    * the Naive-Bayes family — NB's log-likelihood weights need `ln`,
    * which is not correctly rounded and engine-divergent; the same
    * trade [[graft.text.Lm]] makes with its log-free inverse-
    * probability quantization):
    *
    *   w(b) = (cnt_pos(b)+1)·10^6 div (n_pos + buckets)
    *        − (cnt_neg(b)+1)·10^6 div (n_neg + buckets)
    *
    * in ppm micro-units, where `cnt_c(b)` counts gram occurrences of
    * class `c` hashing to bucket `b` and `n_c` is class `c`'s total
    * gram count. Both divisions have non-negative operands, so
    * Spark `div` (truncate) ≡ DuckDB `//` (floor) — no negative-
    * division divergence can enter. A document scores positive when
    * its summed bucket weights exceed zero ([[scoreTrained]] /
    * [[holdoutAccuracy]] — sign test, no further division).
    *
    * Output: `(bucket, cnt_pos, cnt_neg, n_pos, n_neg, w)` — one row
    * per SEEN bucket (≤ `buckets` rows; the totals ride along so
    * scoring can derive the unseen-bucket weight without a second
    * pass). 100 TB shape: one gram census (map-side combined, state
    * ≤ `buckets` cells) + a 1-row totals broadcast; vocabulary
    * growth never grows state — that IS the hashing trick.
    *
    * `labelCol` must be 0/1 integers. Overflow bound: safe while
    * class gram totals stay below ~9·10^12 (`cnt·10^6` in BIGINT) —
    * far beyond any labeled training slice (labeling, not training,
    * is the bottleneck at that size).
    */
  def train(
      labeled: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets $buckets must be positive")
    val g = labeled
      .select(col(labelCol).cast("long").as("__y"),
        explode(grams(TextFunctions.tokens(lower(col(textCol))))).as("__g"))
      .select(bucket(col("__g"), buckets).as("bucket"), col("__y"))
    val counts = g.groupBy(col("bucket"))
      .agg(sum(col("__y")).as("cnt_pos"),
        sum(lit(1L) - col("__y")).as("cnt_neg"))
    val totals = counts.agg(sum(col("cnt_pos")).as("n_pos"),
      sum(col("cnt_neg")).as("n_neg"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("cnt_pos"), col("cnt_neg"),
        col("n_pos"), col("n_neg"),
        (expr(s"(cnt_pos + 1L) * 1000000L div (n_pos + $buckets)") -
          expr(s"(cnt_neg + 1L) * 1000000L div (n_neg + $buckets)")).as("w"))
  }

  /** Scores `df` with a TRAINED table ([[train]] output): per
    * document `(id, n_grams, w_sum, score)` — same output shape as
    * the stand-in [[score]], weights from the labeled census
    * instead. Unseen buckets get the smoothing-only weight derived
    * from the trained totals (the `cnt = 0` case of the same
    * formula). The weight table joins BROADCAST (≤ `buckets` rows).
    */
  def scoreTrained(
      df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int = 4096): DataFrame = {
    val w = weights.select(col("bucket"), col("w"))
    // an EMPTY weights table (empty training slice, or a bad reload
    // path) would make max(n_pos/n_neg) NULL and every coalesce
    // below silently yield NULL w_sum/score — fail loudly instead
    val unseen = weights
      .agg(max(col("n_pos")).as("n_pos"), max(col("n_neg")).as("n_neg"))
      .select(coalesce(
        expr(s"1000000L div (n_pos + $buckets)") -
          expr(s"1000000L div (n_neg + $buckets)"),
        raise_error(lit("scoreTrained: empty weights table — nothing " +
          "was trained, the unseen-bucket weight is undefined"))
          .cast("long")).as("__w0"))
    df.select(col(idCol).as("id"), col(textCol))
      .withColumn("__g",
        explode(grams(TextFunctions.tokens(lower(col(textCol))))))
      .drop(textCol)
      .select(col("id"), bucket(col("__g"), buckets).as("bucket"))
      .join(broadcast(w), Seq("bucket"), "left")
      .crossJoin(broadcast(unseen))
      .withColumn("__w", coalesce(col("w"), col("__w0")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("__w")).as("w_sum"))
      .select(col("id"), col("n_grams"), col("w_sum"),
        (col("w_sum").cast("double") / col("n_grams").cast("double"))
          .as("score"))
  }

  /** Holdout evaluation: per true label, how many documents the
    * sign test (`w_sum > 0` → predict 1) classifies correctly.
    * Output: `(label, n_docs, n_correct)` — all-integer, so the
    * train∘score∘evaluate chain sits under the hash gate end to end.
    * Unscorable documents (no tokens) are excluded by the inner
    * join, identically on both engines.
    */
  def holdoutAccuracy(
      holdout: DataFrame, idCol: String, textCol: String, labelCol: String,
      weights: DataFrame, buckets: Int = 4096): DataFrame = {
    val scored = scoreTrained(holdout, idCol, textCol, weights, buckets)
      .select(col("id"), when(col("w_sum") > 0, 1L).otherwise(0L).as("__pred"))
    holdout.select(col(idCol).as("id"), col(labelCol).cast("long").as("label"))
      .join(scored, Seq("id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__pred") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
  }

  /** The planted-class document frame shared by the train/holdout
    * oracles' Spark sides: class tokens appended deterministically by
    * doc id parity, so the two classes are linearly separable and a
    * working trainer shows near-perfect holdout accuracy (a broken
    * one shows ~50% — the gate pins exact counts either way).
    */
  def plantedLabelSql(whereClause: String): String =
    s"""SELECT doc_id AS id, CAST(doc_id % 2 AS BIGINT) AS label,
       |  text || CASE WHEN doc_id % 2 = 1
       |    THEN ' valueoffer promodeal valueoffer promodeal'
       |    ELSE ' plainnote calmtext plainnote calmtext' END AS text
       |FROM documents $whereClause""".stripMargin

  /** DuckDB rendering of the shared gram→bucket explosion over a
    * labeled CTE `d(id, label, text)`.
    */
  private def gramBucketsSql(buckets: Int): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val (hashG, _) = Sketches.kmvHashSql("g")
    s"""toked AS (SELECT id, label, $toks AS toks FROM d),
       |gr AS (SELECT id, label, unnest(list_concat(toks,
       |    CASE WHEN len(toks) >= 2
       |         THEN list_transform(range(1, len(toks)),
       |                i -> toks[i] || '_' || toks[i + 1])
       |         ELSE [] END)) AS g
       |  FROM toked),
       |gb AS (SELECT id, label, ($hashG % $buckets) AS bucket FROM gr)""".stripMargin
  }

  /** DuckDB rendering of [[train]] over the planted-label frame. */
  def trainSql(trainWhere: String, buckets: Int = 4096): String =
    s"""WITH d AS (${plantedLabelSql(trainWhere)}),
       |${gramBucketsSql(buckets)},
       |counts AS (SELECT bucket, CAST(SUM(label) AS BIGINT) AS cnt_pos,
       |    CAST(SUM(1 - label) AS BIGINT) AS cnt_neg FROM gb GROUP BY bucket),
       |totals AS (SELECT CAST(SUM(cnt_pos) AS BIGINT) AS n_pos,
       |    CAST(SUM(cnt_neg) AS BIGINT) AS n_neg FROM counts)
       |SELECT bucket, cnt_pos, cnt_neg, n_pos, n_neg,
       |  CAST((cnt_pos + 1) * 1000000 // (n_pos + $buckets)
       |    - (cnt_neg + 1) * 1000000 // (n_neg + $buckets) AS BIGINT) AS w
       |FROM counts, totals ORDER BY bucket""".stripMargin

  /** DuckDB rendering of [[train]] + [[holdoutAccuracy]]: weights
    * from `trainWhere` docs, evaluated on `holdoutWhere` docs.
    */
  def holdoutSql(
      trainWhere: String, holdoutWhere: String, buckets: Int = 4096): String =
    s"""WITH weights AS (${trainSql(trainWhere, buckets).replace("ORDER BY bucket", "")}),
       |unseen AS (SELECT CAST(1000000 // (MAX(n_pos) + $buckets)
       |    - 1000000 // (MAX(n_neg) + $buckets) AS BIGINT) AS w0 FROM weights),
       |d AS (${plantedLabelSql(holdoutWhere)}),
       |${gramBucketsSql(buckets)},
       |scored AS (SELECT gb.id, gb.label,
       |    CAST(SUM(coalesce(weights.w, unseen.w0)) AS BIGINT) AS w_sum
       |  FROM gb LEFT JOIN weights ON gb.bucket = weights.bucket, unseen
       |  GROUP BY gb.id, gb.label)
       |SELECT label, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN (CASE WHEN w_sum > 0 THEN 1 ELSE 0 END) = label
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       |FROM scored GROUP BY label ORDER BY label""".stripMargin

  /** Reliability census — the calibration diagnostic run on a
    * DISJOINT holdout after training: documents banded by their mean
    * gram weight (the score, kept integer: `(w_sum + n·10^6) div n`
    * then banded — the offset keeps Spark's truncating `div` on
    * DuckDB's floor semantics for negative sums), each band reporting
    * its observed positive rate. A working classifier shows pos_ppm
    * rising monotonically with the band; a flat census means the
    * scores carry no signal at any threshold — the eval that catches
    * "accurate at the sign test, useless for ranked selection".
    * Band count is bounded by the weight range / bandWidth, never by
    * data. `bandWidth` must divide 10^6 (center alignment).
    */
  def reliability(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      weights: DataFrame, bandWidth: Long = 500L,
      buckets: Int = 4096): DataFrame = {
    require(bandWidth > 0 && 1000000L % bandWidth == 0,
      s"bandWidth $bandWidth must divide 1e6")
    val center = 1000000L / bandWidth
    scoreTrained(df, idCol, textCol, weights, buckets)
      .join(df.select(col(idCol).as("id"),
        col(labelCol).cast("long").as("__lab")), Seq("id"))
      .select(expr(s"((w_sum + n_grams * 1000000L) div n_grams)" +
        s" div ${bandWidth}L - ${center}L").as("band"), col("__lab"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__lab")).as("n_pos"))
      .select(col("band"), col("n_docs"), col("n_pos"),
        expr("(n_pos * 1000000L) div n_docs").as("pos_ppm"))
  }

  /** DuckDB rendering of [[reliability]] over the planted-label
    * corpus (train/apply `WHERE` clauses as in [[scoreTrainedSql]]).
    */
  def reliabilitySql(
      trainWhere: String, applyWhere: String, bandWidth: Long = 500L,
      buckets: Int = 4096): String = {
    val center = 1000000L / bandWidth
    s"""WITH sc AS (${scoreTrainedSql(trainWhere, applyWhere, buckets)
        .replace("ORDER BY gb.id", "")}),
       |rl AS (SELECT ((sc.w_sum + sc.n_grams * 1000000) // sc.n_grams)
       |    // $bandWidth - $center AS band,
       |    CAST(d2.doc_id % 2 AS BIGINT) AS lab
       |  FROM sc JOIN (SELECT doc_id FROM documents $applyWhere) d2
       |    ON sc.id = d2.doc_id)
       |SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(lab) AS BIGINT) AS n_pos,
       |  (CAST(SUM(lab) AS BIGINT) * 1000000) // count(*) AS pos_ppm
       |FROM rl GROUP BY 1 ORDER BY band""".stripMargin
  }

  /** Precision-recall threshold sweep — HOW a quality-filter
    * threshold actually gets picked: for every score band (the
    * [[reliability]] banding), the confusion counts and integer-ppm
    * precision/recall of the filter "keep documents scoring ≥ this
    * band". Cumulative sums run highest-band-down over the BAND
    * census (bounded by score range / bandWidth, never by data), so
    * the window is census-sized; the corpus-sized work is the same
    * score + band aggregation as [[reliability]]. Read the row where
    * precision_ppm first clears the target — that band is the
    * production threshold.
    * Output: `(band, n_docs, n_pos, tp, fp, fn, precision_ppm,
    * recall_ppm)`, one row per non-empty band, band desc = threshold
    * sweep from strictest to loosest.
    */
  def prCurve(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      weights: DataFrame, bandWidth: Long = 500L,
      buckets: Int = 4096): DataFrame = {
    val bands = reliability(df, idCol, textCol, labelCol, weights,
      bandWidth, buckets)
    val w = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // total_pos via a whole-frame window, NOT a separate aggregate
    // crossJoined back: that would evaluate the corpus-scoring
    // pipeline under `bands` twice (once per reference)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    bands
      .select(col("band"), col("n_docs"), col("n_pos"),
        sum(col("n_pos")).over(w).as("tp"),
        (sum(col("n_docs")).over(w) - sum(col("n_pos")).over(w)).as("fp"),
        sum(col("n_pos")).over(wAll).as("total_pos"))
      .select(col("band"), col("n_docs"), col("n_pos"), col("tp"), col("fp"),
        (col("total_pos") - col("tp")).as("fn"),
        expr("(tp * 1000000L) div greatest(tp + fp, 1L)").as("precision_ppm"),
        expr("(tp * 1000000L) div greatest(total_pos, 1L)").as("recall_ppm"))
  }

  /** DuckDB rendering of [[prCurve]] over the planted-label corpus. */
  def prCurveSql(
      trainWhere: String, applyWhere: String, bandWidth: Long = 500L,
      buckets: Int = 4096): String =
    s"""WITH bands AS MATERIALIZED (${reliabilitySql(trainWhere, applyWhere,
          bandWidth, buckets).replace("ORDER BY band", "")}),
       |cum AS (SELECT band, n_docs, n_pos,
       |    CAST(SUM(n_pos) OVER (ORDER BY band DESC
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
       |    CAST(SUM(n_docs) OVER (ORDER BY band DESC
       |      ROWS UNBOUNDED PRECEDING)
       |      - SUM(n_pos) OVER (ORDER BY band DESC
       |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp,
       |    CAST(SUM(n_pos) OVER () AS BIGINT) AS total_pos
       |  FROM bands)
       |SELECT band, n_docs, n_pos, tp, fp,
       |  total_pos - tp AS fn,
       |  (tp * 1000000) // GREATEST(tp + fp, 1) AS precision_ppm,
       |  (tp * 1000000) // GREATEST(total_pos, 1) AS recall_ppm
       |FROM cum ORDER BY band""".stripMargin

  /** DuckDB rendering of [[train]] + [[scoreTrained]]: weights from
    * `trainWhere` docs, per-document scores on `applyWhere` docs —
    * the oracle for the persist-and-reload gate (the SQL recomputes
    * the weights inline; the Spark side must produce the identical
    * scores FROM THE RELOADED parquet, proving the round trip).
    */
  def scoreTrainedSql(
      trainWhere: String, applyWhere: String, buckets: Int = 4096): String =
    s"""WITH weights AS (${trainSql(trainWhere, buckets).replace("ORDER BY bucket", "")}),
       |unseen AS (SELECT CAST(1000000 // (MAX(n_pos) + $buckets)
       |    - 1000000 // (MAX(n_neg) + $buckets) AS BIGINT) AS w0 FROM weights),
       |d AS (${plantedLabelSql(applyWhere)}),
       |${gramBucketsSql(buckets)}
       |SELECT gb.id, COUNT(*) AS n_grams,
       |  CAST(SUM(coalesce(weights.w, unseen.w0)) AS BIGINT) AS w_sum,
       |  CAST(SUM(coalesce(weights.w, unseen.w0)) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS score
       |FROM gb LEFT JOIN weights ON gb.bucket = weights.bucket, unseen
       |GROUP BY gb.id ORDER BY gb.id""".stripMargin

  /** DuckDB rendering of [[score]] over `documents(doc_id, text)`
    * restricted by `whereClause`.
    */
  def scoreSql(whereClause: String, buckets: Int = 4096): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val (hashG, _) = Sketches.kmvHashSql("g")
    val (hashW, _) = Sketches.kmvHashSql(s"'w:' || CAST(($hashG % $buckets) AS VARCHAR)")
    s"""WITH d AS (SELECT doc_id AS id, $toks AS toks FROM documents $whereClause),
       |gr AS (SELECT id, unnest(list_concat(toks,
       |    CASE WHEN len(toks) >= 2
       |         THEN list_transform(range(1, len(toks)),
       |                i -> toks[i] || '_' || toks[i + 1])
       |         ELSE [] END)) AS g
       |  FROM d),
       |w AS (SELECT id, ($hashW % 2001 - 1000) AS w FROM gr)
       |SELECT id, COUNT(*) AS n_grams, CAST(SUM(w) AS BIGINT) AS w_sum,
       |  CAST(SUM(w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS score
       |FROM w GROUP BY id ORDER BY id""".stripMargin
  }
}
