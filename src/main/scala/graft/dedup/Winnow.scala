package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
  * the MOSS algorithm): from each sliding window of `window`
  * consecutive char-`k`-gram hashes, keep the minimum (rightmost on
  * ties), then dedupe — a position-anchored ~2/(window+1) sample of
  * the document's grams with the guarantee that any shared substring
  * of length ≥ `k + window − 1` yields at least one shared
  * fingerprint. The local-sampling upgrade over [[Dedup.charNgrams]]
  * membership: robust partial-overlap/plagiarism detection at a
  * fraction of the gram volume, with positions for span recovery.
  * The reference project has no text pipeline; this extends SURVEY
  * §2.5's dedup category.
  *
  * Determinism: the per-window argmin is `min(struct(h, -pos))` —
  * lexicographic struct ordering picks the smallest hash and, on
  * hash ties, the RIGHTMOST position (the paper's rule), identically
  * in both engine renderings. Hashes are the library's md5-prefix
  * integers; everything is exact integer arithmetic.
  *
  * 100 TB shape: gram hashing is map-only; the window selection is
  * ONE shuffle on the document id (both window passes — the framed
  * min and the whole-partition gram count — share the partition);
  * the final dedupe shuffles FINGERPRINTS, never text or grams. A
  * document's grams land on one partition — winnowing is
  * per-document local by definition; pathological multi-GB documents
  * should be length-capped upstream ([[graft.text.QualityFilters]]).
  * Documents with fewer than `k + window − 1` chars produce no
  * fingerprints (no full window exists).
  */
object Winnow {

  /** Output: `(idCol, pos, fp)` — the 0-based gram position and hash
    * of each selected fingerprint, one row per distinct selection,
    * suitable for an equi-join with another corpus' fingerprints
    * (shared-fp pairs ≈ shared spans).
    */
  def fingerprints(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 8,
  ): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(window >= 1, s"window $window must be >= 1")
    Seq("__g", "__h", "__m", "__n", "pos", "fp").foreach(c =>
      require(!df.columns.contains(c),
        s"fingerprints reserves column name $c; rename it in the input"))
    val grams = df.select(col(idCol),
        posexplode(transform(
          sequence(lit(1), greatest(length(col(textCol)) - (k - 1), lit(1))),
          i => col(textCol).substr(i, lit(k)))).as(Seq("pos", "__g")))
      .filter(length(col("__g")) === k)
      .withColumn("__h",
        conv(substring(md5(col("__g")), 1, 7), 16, 10).cast("long"))
    val byDoc = Window.partitionBy(col(idCol))
    val sel = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    grams
      .withColumn("__m",
        min(struct(col("__h").as("h"), (-col("pos")).as("np"))).over(sel))
      .withColumn("__n", count(lit(1)).over(byDoc))
      .filter(col("pos") <= col("__n") - window)
      .select(col(idCol),
        (-col("__m").getField("np")).cast("int").as("pos"),
        col("__m").getField("h").as("fp"))
      .distinct()
  }

  /** Document pairs sharing at least `minShared` winnowing
    * fingerprints — the partial-overlap/plagiarism candidate pass:
    * because of the winnowing guarantee, any pair sharing a run of
    * `k + window − 1` chars meets at minimum 1 here, and longer
    * overlaps scale the count ~linearly with overlap length. Output:
    * `(id_a, id_b, n_shared_fp)` with `id_a < id_b`.
    *
    * Scale shape: the shared-fp equi-join IS the candidate filter
    * (pairs sharing no fingerprint never meet), on a frame already
    * winnowed to ~2/(window+1) of the gram volume — the same join
    * pattern as [[Dedup.ngramJaccardPairs]] at a fraction of the
    * input size. `maxFpDocs` drops ubiquitous fingerprints
    * (boilerplate spans) via a broadcast anti-join before the
    * self-join, bounding the quadratic blow-up; counts only
    * UNDER-count when it fires, like the Jaccard stop-gram guard.
    */
  def sharedFingerprintPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 8, minShared: Int = 2,
      maxFpDocs: Long = 1000L,
  ): DataFrame = {
    require(minShared >= 1, s"minShared $minShared must be >= 1")
    val fp = fingerprints(df, idCol, textCol, k, window)
      .select(col(idCol).as("id"), col("fp")).distinct()
    val bounded =
      if (maxFpDocs <= 0) fp
      else {
        val hot = fp.groupBy(col("fp"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxFpDocs)
          .select(col("fp"))
        fp.join(broadcast(hot), Seq("fp"), "left_anti")
      }
    bounded.as("a")
      .join(bounded.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).cast("int").as("n_shared_fp"))
      .filter(col("n_shared_fp") >= minShared)
  }

  /** DuckDB rendering of [[sharedFingerprintPairs]] over
    * `documents(doc_id, text)` restricted by `whereClause`
    * (stop-fingerprint guard disabled, matching `maxFpDocs = 0`).
    */
  def sharedFingerprintPairsSql(
      k: Int, window: Int, minShared: Int, whereClause: String): String =
    s"""WITH w0 AS (${fingerprintsSql(k, window, whereClause)}),
       |f AS (SELECT DISTINCT doc_id AS id, fp FROM w0)
       |SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS INT) AS n_shared_fp
       |FROM f a JOIN f b ON a.fp = b.fp AND a.id < b.id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared
       |ORDER BY id_a, id_b""".stripMargin

  /** DuckDB rendering of [[fingerprints]] over `documents(doc_id,
    * text)` restricted by `whereClause` (a full `WHERE ...` clause
    * or "").
    */
  def fingerprintsSql(k: Int, window: Int, whereClause: String): String = {
    require(k >= 1 && window >= 1,
      s"k $k and window $window must be >= 1")
    s"""WITH d AS (SELECT doc_id, text FROM documents $whereClause),
       |g0 AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       |  substr(text, CAST(i AS INT), $k) AS gram
       |  FROM d, unnest(range(1, greatest(length(text) - ${k - 1}, 1) + 1)) AS t(i)),
       |g AS (SELECT doc_id, pos, CAST(('0x' || substr(md5(gram), 1, 7)) AS BIGINT) AS h
       |  FROM g0 WHERE length(gram) = $k),
       |win AS (SELECT doc_id, pos,
       |  min({'h': h, 'np': -pos}) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN CURRENT ROW AND ${window - 1} FOLLOWING) AS m,
       |  count(*) OVER (PARTITION BY doc_id) AS n FROM g)
       |SELECT DISTINCT doc_id, CAST(-(m.np) AS INT) AS pos, m.h AS fp
       |FROM win WHERE pos <= n - $window""".stripMargin
  }
}
