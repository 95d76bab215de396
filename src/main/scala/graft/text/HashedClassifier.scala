package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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
