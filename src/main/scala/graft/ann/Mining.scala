package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based parallel-corpus mining (Artetxe & Schwenk 2019,
  * "Margin-based Parallel Corpus Mining with Multilingual Sentence
  * Embeddings" — the CCMatrix/LASER recipe): raw cosine is a poor
  * mined-pair criterion because some sentences are "hubs" that score
  * high against everything; the fix scores a candidate pair by its
  * cosine RELATIVE to what each side scores against its own nearest
  * neighbors — `margin(x, y) = cos(x, y) / ((avgNN(x) + avgNN(y)) /
  * 2)`, the "ratio" margin — and keeps, per source sentence, the
  * best-margin target above a threshold (the "max" strategy).
  *
  * Determinism: the kNN runs use the family's exact verifier
  * ([[Ann.bruteForceTopK]], gate contract — at corpus scale both
  * runs swap to any ANN family unchanged); each side's neighbor
  * mean is a rank-ordered IEEE fold over its ≤ k scores divided by
  * the actual count; the argmax ties to the smaller target id. All
  * of it is oracle arithmetic, so mined pairs hash-gate.
  *
  * 100 TB shape: the margin layer itself is bounded — the forward
  * side's neighbor mean rides the run as a window aggregate (one
  * pass, no persist), the backward side's one-row-per-sentence mean
  * frame equi-joins on, then one per-source argmax; the
  * quadratic lives entirely inside the pluggable kNN stage, which is
  * the ANN family's already-audited problem.
  */
object Mining {

  /** Mine `(src_id, dst_id, cos, margin)` pairs: per source row the
    * best-margin target with `margin >= threshold`. `srcSide` and
    * `dstSide` are independent corpora (self-matches legitimate —
    * ids may collide across languages).
    */
  def marginMine(
      srcSide: DataFrame, dstSide: DataFrame,
      idCol: String, vecCol: String, k: Int,
      threshold: Double,
  ): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    marginFromRuns(
      Ann.bruteForceTopK(srcSide, dstSide, idCol, vecCol, k,
        excludeSelf = false),
      Ann.bruteForceTopK(dstSide, srcSide, idCol, vecCol, k,
        excludeSelf = false),
      threshold)
  }

  /** The margin layer over CALLER-SUPPLIED kNN runs — the actually
    * pluggable form ([[marginMine]] is the gate-facing exact-run
    * composition): `fwd`/`bwd` are `(query_id, neighbor_id, rank,
    * score)` frames from ANY of the family's searches (LSH, IVF,
    * graph, funnel — the score must be the same metric both ways).
    * Everything here is bounded: the forward run's neighbor mean is
    * a window aggregate riding the run itself (single lineage, no
    * persist), the backward mean frame equi-joins on, then one
    * per-source argmax.
    */
  def marginFromRuns(
      fwd0: DataFrame, bwd: DataFrame, threshold: Double,
  ): DataFrame = {
    // the forward run feeds ONE lineage: its per-query neighbor mean
    // rides along as a WINDOW aggregate (same partition key the
    // argmax groups on) instead of a separate mean frame joined back
    // — the r20 shape persisted the run MEMORY_AND_DISK to stop the
    // upstream kNN search executing twice through two lineages, and
    // leaked the cache entry for the session's lifetime (r20 ADVICE).
    // The window computes the IDENTICAL rank-ordered IEEE fold
    // (sort_array over (rank, score) structs, 0.0-seeded aggregate,
    // divided by the window count), so every mined value is
    // bit-equal; the plan loses one self-join, one persist, and the
    // double-execution hazard in one move. bwd still feeds one mean
    // frame (it has no row-level role — only its means join).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
    def nnMean(run: DataFrame, outId: String, outMean: String): DataFrame =
      run.groupBy(col("query_id"))
        .agg(sort_array(collect_list(struct(col("rank"), col("score"))))
          .as("ms"), count(lit(1)).cast("double").as("cnt"))
        .select(col("query_id").as(outId),
          (expr("aggregate(ms, CAST(0.0 AS DOUBLE), " +
            "(acc, m) -> acc + m.score)") / col("cnt")).as(outMean))
    val bm = nnMean(bwd, "dst_id", "dst_nn")
    val margins = fwd0
      .withColumn("ms",
        sort_array(collect_list(struct(col("rank"), col("score"))).over(w)))
      .withColumn("src_nn",
        expr("aggregate(ms, CAST(0.0 AS DOUBLE), " +
          "(acc, m) -> acc + m.score)") /
          count(lit(1)).over(w).cast("double"))
      .select(col("query_id").as("src_id"), col("neighbor_id").as("dst_id"),
        col("score").as("cos"), col("src_nn"))
      .join(bm, Seq("dst_id"))
      // degenerate-neighborhood guard: a non-positive mean-NN sum
      // makes the ratio margin NaN/Inf (or sign-flipped), and NaN
      // sorts LARGEST under Spark's comparison semantics — such a
      // row would pass `margin >= threshold` and win the argmax over
      // every real candidate; exclude it before the margin divide
      .filter((col("src_nn") + col("dst_nn")) > lit(0.0))
      .select(col("src_id"), col("dst_id"), col("cos"),
        (col("cos") / ((col("src_nn") + col("dst_nn")) / lit(2.0)))
          .as("margin"))
    margins
      .groupBy(col("src_id"))
      .agg(max(struct(col("margin"), (-col("dst_id")).as("negdst"),
        col("dst_id").as("dst_id"), col("cos").as("cos"))).as("best"))
      .select(col("src_id"), col("best.dst_id").as("dst_id"),
        col("best.cos").as("cos"), col("best.margin").as("margin"))
      .filter(col("margin") >= threshold)
  }

  /** DuckDB rendering of [[marginMine]] over `embeddings` with the
    * two sides selected by `srcWhere` / `dstWhere` (full WHERE
    * clauses). Same fold pairing as every census mean here: Spark's
    * 0.0-seeded rank-ordered `aggregate` ≡ DuckDB's seedless
    * `list_reduce` over `list(score ORDER BY rank)`.
    */
  def marginMineSql(
      k: Int, dim: Int, threshold: Double,
      srcWhere: String, dstWhere: String): String = {
    val nz = s"${Ann.dotSql("embedding", "embedding", dim)} > 0"
    def run(qCte: String, cCte: String, outCte: String): String =
      s"""$outCte AS (SELECT query_id, neighbor_id, score, rank FROM (
         |  SELECT q.id AS query_id, c.id AS neighbor_id,
         |    ${Ann.cosineSql("q.v", "c.v", dim)} AS score,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY ${Ann.cosineSql("q.v", "c.v", dim)} DESC, c.id)
         |      AS rank
         |  FROM $qCte q, $cCte c) r WHERE rank <= $k)""".stripMargin
    s"""WITH s AS (SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings $srcWhere AND $nz),
       |d AS (SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings $dstWhere AND $nz),
       |${run("s", "d", "fwd")},
       |${run("d", "s", "bwd")},
       |${marginTailSql(threshold)}""".stripMargin
  }

  /** The margin-layer CTE tail over existing `fwd`/`bwd` run CTEs
    * (`(query_id, neighbor_id, score, rank)`) — ONE renderer shared
    * by the exact and LSH oracles (the [[marginFromRuns]] twin), so
    * the mean fold and tie rules cannot drift.
    */
  private def marginTailSql(threshold: Double): String = {
    def mean(runCte: String, outCte: String, idAs: String,
        meanAs: String): String =
      s"""$outCte AS (SELECT query_id AS $idAs,
         |    list_reduce(list(score ORDER BY rank), (x, y) -> x + y)
         |      / CAST(count(*) AS DOUBLE) AS $meanAs
         |  FROM $runCte GROUP BY query_id)""".stripMargin
    s"""${mean("fwd", "fm", "src_id", "src_nn")},
       |${mean("bwd", "bm", "dst_id", "dst_nn")},
       |margins AS (SELECT f.query_id AS src_id, f.neighbor_id AS dst_id,
       |    f.score AS cos,
       |    f.score / ((fm.src_nn + bm.dst_nn) / 2.0) AS margin
       |  FROM fwd f
       |  JOIN fm ON fm.src_id = f.query_id
       |  JOIN bm ON bm.dst_id = f.neighbor_id
       |  WHERE (fm.src_nn + bm.dst_nn) > 0.0),
       |best AS (SELECT src_id, dst_id, cos, margin FROM (
       |  SELECT src_id, dst_id, cos, margin, row_number() OVER (
       |    PARTITION BY src_id ORDER BY margin DESC, dst_id) AS rn
       |  FROM margins) b WHERE rn = 1)
       |SELECT src_id, dst_id, cos, margin FROM best
       |WHERE margin >= $threshold""".stripMargin
  }

  /** [[marginFromRuns]] composed with [[Ann.lshTopK]] runs both ways
    * — the production composition the gate pins (the exact-run twin
    * is [[marginMine]]). NOTE [[Ann.lshTopK]] always drops equal-id
    * pairs; mine across sides with disjoint id spaces (the gate's
    * residue slices are) or re-key first.
    */
  def marginMineLsh(
      srcSide: DataFrame, dstSide: DataFrame,
      idCol: String, vecCol: String, k: Int, threshold: Double,
      planes: Int = 12, dim: Int = 64, multiProbe: Int = 1,
  ): DataFrame =
    marginFromRuns(
      Ann.lshTopK(srcSide, dstSide, idCol, vecCol, k, planes, dim,
        multiProbe),
      Ann.lshTopK(dstSide, srcSide, idCol, vecCol, k, planes, dim,
        multiProbe),
      threshold)

  /** DuckDB rendering of [[marginMineLsh]] — two LSH run chains (the
    * [[Ann.lshTopKSql]] shape with per-side slices) under the SHARED
    * margin tail.
    */
  def marginMineLshSql(
      k: Int, dim: Int, threshold: Double,
      srcWhere: String, dstWhere: String,
      planes: Int = 12, multiProbe: Int = 1): String = {
    val nz = s"${Ann.dotSql("embedding", "embedding", dim)} > 0"
    val sig = Ann.lshSignatureSql("v", planes, dim)
    val masks = Ann.probeMasks(planes, multiProbe).mkString(", ")
    def side(cte: String, where: String): String =
      s"""$cte AS (SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings $where AND $nz),
         |${cte}s AS (SELECT id, v, $sig AS sig FROM $cte)""".stripMargin
    def run(qCte: String, cCte: String, outCte: String): String =
      s"""${outCte}0 AS (SELECT DISTINCT q.query_id, c.id AS neighbor_id,
         |    ${Ann.cosineSql("q.qv", "c.v", dim)} AS score
         |  FROM (SELECT id AS query_id, v AS qv, xor(sig, m.mask) AS bucket
         |        FROM ${qCte}s CROSS JOIN (SELECT unnest([$masks]) AS mask) m) q
         |  JOIN (SELECT id, v, sig AS bucket FROM ${cCte}s) c USING (bucket)
         |  WHERE q.query_id <> c.id),
         |$outCte AS (SELECT query_id, neighbor_id, score, rank FROM (
         |  SELECT query_id, neighbor_id, score, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id)
         |    AS rank
         |  FROM ${outCte}0) r WHERE rank <= $k)""".stripMargin
    s"""WITH ${side("s", srcWhere)},
       |${side("d", dstWhere)},
       |${run("s", "d", "fwd")},
       |${run("d", "s", "bwd")},
       |${marginTailSql(threshold)}""".stripMargin
  }
}
