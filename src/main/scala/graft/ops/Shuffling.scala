package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global training-order shuffle: every epoch of LLM
  * training consumes the corpus in a pseudorandom order, and the
  * order must be REPRODUCIBLE (restarts, re-runs, audits) and
  * GLOBAL (a per-file or per-partition shuffle leaves topical runs
  * from the original layout — curriculum leakage at shard
  * boundaries). The order key is `md5(id || ':' || seed)`, so
  * membership of every position is a pure function of (id, seed),
  * like the library's other md5-keyed sampling ops
  * ([[Sampling.hashSample]]).
  *
  * The interesting part at scale is the exact GLOBAL rank without a
  * global sort into one reducer: the naive
  * `row_number() over (order by key)` plans a single-partition
  * window. This uses the same distributed-scan shape as
  * [[Selection.selectToBudget]]: range-partition on (key, id),
  * per-partition counts collect ONE row per partition, prefix-sum on
  * the driver, broadcast offsets, map-only sequential rank per
  * partition. One range shuffle + two map passes at any corpus size.
  *
  * Writing the result sorted by `rank` (e.g. through
  * [[graft.sources.Sources.writeSharded]] keyed on
  * `rank div rows_per_shard`) yields shard files that ARE the
  * training order — readers stream shards sequentially and get the
  * global shuffle for free.
  */
object Shuffling {

  /** Global shuffle rank per row: `(id, shuffle_key, rank)` with
    * `rank` 0-based, dense, a permutation of `0 until count` ordered
    * by `(shuffle_key, id)`. Deterministic in (id, seed) and
    * independent of input partitioning.
    */
  def shuffleRank(
      df: DataFrame, idCol: String, seed: Long, partitions: Int = 0,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyed = df.select(col(idCol).cast("long").as("id"))
      .withColumn("shuffle_key",
        md5(concat(col("id").cast("string"), lit(":" + seed)).cast("binary")))
      .repartitionByRange(p, col("shuffle_key"), col("id"))
      .sortWithinPartitions(col("shuffle_key"), col("id"))
      .localCheckpoint() // both passes read the SAME partitioning
    // pass 1: bounded driver collect — one (pid, n) row per partition
    val counts = keyed
      .groupBy(spark_partition_id().as("pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until p).map { i =>
        val o = i -> acc
        acc += counts.getOrElse(i, 0L)
        o
      }.toMap
    }
    val offB = spark.sparkContext.broadcast(offsets)
    // pass 2: map-only sequential rank per partition + offset
    keyed.select(col("id"), col("shuffle_key")).as[(Long, String)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var run = offB.value.getOrElse(pid, 0L)
        it.map { case (id, key) =>
          val r = run
          run += 1L
          (id, key, r)
        }
      }.toDF("id", "shuffle_key", "rank")
  }

  /** The distributed-rank device generalized to ARBITRARY sort
    * columns: exact 1-based global rank of `df`'s rows under
    * `(sortCols…, idCol)` — range partition on the sort key, bounded
    * one-row-per-partition count collect, offset broadcast, map-side
    * sequential rank. Never a single-partition window. `idCol` must
    * be a unique long (the total-order tie-break). Output:
    * `(idCol, rank)`.
    *
    * [[shuffleRank]] above is the md5-keyed instance of the same
    * device (kept separate because it carries the shuffle key through
    * and ranks 0-based — its gated plan predates this
    * generalization); metric-ordered consumers ([[Rfm]] quartiles)
    * call this one.
    */
  def rankBy(
      df: DataFrame, idCol: String, sortCols: Seq[Column],
      partitions: Int = 0,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyed = df
      .repartitionByRange(p, sortCols :+ col(idCol): _*)
      .sortWithinPartitions(sortCols :+ col(idCol): _*)
      .localCheckpoint()
    val counts = keyed
      .groupBy(spark_partition_id().as("pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until p).map { i =>
        val o = i -> acc
        acc += counts.getOrElse(i, 0L)
        o
      }.toMap
    }
    val offB = spark.sparkContext.broadcast(offsets)
    keyed.select(col(idCol)).as[Long]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var run = offB.value.getOrElse(pid, 0L)
        it.map { id => run += 1L; (id, run) }
      }.toDF(idCol, "rank")
  }

  /** Spearman rank agreement between two per-row signals — "do my two
    * quality filters agree?": both columns get an EXACT global rank
    * via [[rankBy]] (the distributed prefix-scan device — never a
    * single-partition window), and the census emits `(n, sum_d2,
    * rho_ppm)` with `rho_ppm = 10^6 − (6·10^6·Σd²) div (n(n²−1))` —
    * the classic Spearman formula kept all-integer. Ties break by
    * `idCol` (deterministic, mirrored in the oracle), the policy that
    * trades the textbook average-tied-rank for engine-exactness; for
    * an agreement AUDIT the difference is noise.
    *
    * Integer-range dial: `6·10^6·Σd²` must fit int64 and worst-case
    * Σd² (reversed ranks) is `n(n²−1)/3`, so `2·10^6·n³ ≤ 2^63−1` →
    * n ≤ 16 600. Both engines REQUIRE that bound rather than silently
    * overflowing (Spark raise_error, DuckDB error()); at corpus scale
    * run it on a deterministic [[Sampling.hashSample]] slice (rank
    * agreement is a statistical property — a 10^4-row hash sample
    * estimates ρ to ±0.02) or bucket the ranks first.
    */
  def rankCorrelation(
      df: DataFrame, idCol: String, xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(col(idCol).as("__id"), xCol.as("__x"), yCol.as("__y"))
      .localCheckpoint() // both rank passes read it; one materialization
    val rx = rankBy(base, "__id", Seq(col("__x")))
      .withColumnRenamed("rank", "rx")
    val ry = rankBy(base, "__id", Seq(col("__y")))
      .withColumnRenamed("rank", "ry")
    rx.join(ry, Seq("__id"))
      .agg(count(lit(1)).as("n"),
        sum((col("rx") - col("ry")) * (col("rx") - col("ry"))).as("sum_d2"))
      .select(col("n"), col("sum_d2"),
        expr("CASE WHEN n > 16600 THEN raise_error(" +
          "'rankCorrelation: n > 16600 can overflow the exact integer " +
          "rho (worst-case 6e6*sum_d2 = 2e6*n^3) - hashSample the " +
          "input first') " +
          "ELSE 1000000L - (6000000L * sum_d2) " +
          "div greatest(n * (n * n - 1L), 1L) END")
          .cast("long").as("rho_ppm"))
  }

  /** DuckDB rendering of [[rankCorrelation]] over `(idExpr, xExpr,
    * yExpr)` rows from `fromClause`.
    */
  def rankCorrelationSql(
      fromClause: String, idExpr: String, xExpr: String, yExpr: String): String =
    s"""WITH d AS (SELECT $idExpr AS id, $xExpr AS x, $yExpr AS y
       |  FROM $fromClause),
       |rx AS (SELECT id, row_number() OVER (ORDER BY x, id) AS rx FROM d),
       |ry AS (SELECT id, row_number() OVER (ORDER BY y, id) AS ry FROM d),
       |j AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum((rx.rx - ry.ry) * (rx.rx - ry.ry)) AS BIGINT) AS sum_d2
       |  FROM rx JOIN ry USING (id))
       |SELECT n, sum_d2,
       |  CAST(CASE WHEN n > 16600 THEN error(
       |      'rankCorrelation: n > 16600 can overflow the exact rho')
       |    ELSE 1000000 - (6000000 * sum_d2)
       |      // GREATEST(n * (n * n - 1), 1) END AS BIGINT) AS rho_ppm
       |FROM j""".stripMargin

  /** Deterministic negative sampling for contrastive training: `k`
    * pseudo-random corpus rows per anchor, WITHOUT an all-pairs scan
    * — the corpus gets a dense [[shuffleRank]] index once, then probe
    * `j` of anchor `a` targets rank `md5(a:j:seed) mod N` and
    * resolves through a rank equi-join (anchors×k probe rows against
    * the rank-keyed corpus — at 100 TB the ranked corpus is written
    * once per epoch and every trainer shard joins its own probes).
    * Hash-keyed, so negatives are reproducible and shard-stable, and
    * the draw is uniform over the corpus. Self-collisions (a probe
    * landing on the anchor itself) are dropped — callers get ≤ k
    * negatives, never a degenerate positive.
    *
    * Output: `(anchor_id, j, neg_id)` with `j` 1-based.
    */
  def negativeSample(
      anchors: DataFrame, anchorIdCol: String,
      corpus: DataFrame, corpusIdCol: String,
      k: Int, seed: Long,
  ): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val ranked = shuffleRank(corpus, corpusIdCol, seed)
      .select(col("rank"), col("id").as("neg_id"))
    val n = ranked.count()
    require(n > 0, "negativeSample needs a non-empty corpus")
    val probes = anchors.select(col(anchorIdCol).as("anchor_id"))
      .select(col("anchor_id"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("rank",
        graft.ops.Sketches.kmvHash(concat_ws(":",
          col("anchor_id").cast("string"), col("j").cast("string"),
          lit(seed.toString))) % n)
    probes.join(ranked, Seq("rank"))
      .filter(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("j"), col("neg_id"))
  }

  /** DuckDB rendering of [[negativeSample]] over
    * `embeddings(vec_id)`: anchors restricted by `anchorWhere`,
    * corpus the whole table.
    */
  def negativeSampleSql(anchorWhere: String, k: Int, seed: Long): String = {
    val (hash, _) = Sketches.kmvHashSql(
      s"(CAST(anchor_id AS VARCHAR) || ':' || CAST(j AS VARCHAR) || ':' || '$seed')")
    s"""WITH ranked AS (SELECT vec_id AS neg_id,
       |    CAST(row_number() OVER (ORDER BY
       |      md5(CAST(vec_id AS VARCHAR) || ':$seed'), vec_id) - 1
       |      AS BIGINT) AS rank
       |  FROM embeddings),
       |n AS (SELECT count(*) AS n FROM ranked),
       |probes AS (SELECT anchor_id, CAST(j AS INT) AS j,
       |    $hash % (SELECT n FROM n) AS rank
       |  FROM (SELECT vec_id AS anchor_id FROM embeddings $anchorWhere) a,
       |       unnest(range(1, $k + 1)) AS u(j))
       |SELECT anchor_id, j, neg_id
       |FROM probes JOIN ranked USING (rank)
       |WHERE neg_id <> anchor_id
       |ORDER BY anchor_id, j""".stripMargin
  }

  /** DuckDB rendering of [[shuffleRank]] over `documents` restricted
    * by `whereClause`: the plain global window, value-identical.
    */
  def shuffleRankSql(seed: Long, whereClause: String = ""): String =
    s"""WITH keyed AS (SELECT doc_id AS id,
       |    md5(CAST(doc_id AS VARCHAR) || ':$seed') AS shuffle_key
       |  FROM documents $whereClause)
       |SELECT id, shuffle_key,
       |  CAST(row_number() OVER (ORDER BY shuffle_key, id) - 1 AS BIGINT)
       |    AS rank
       |FROM keyed""".stripMargin

  /** Deterministic SOURCE INTERLEAVING for training order: round-robin
    * across sources (each source's rows first shuffled md5-style
    * within the source), so consecutive training examples come from
    * different sources — the gradient-diversity layout streaming
    * loaders build, here materialized as an explicit position column.
    * `pos = (rank − 1) · n_sources + (source_idx − 1)` with `rank`
    * the row's 1-based md5 order within its source and `source_idx`
    * the source's 1-based alphabetical ordinal; positions are unique,
    * and sources with fewer rows simply stop contributing (the tail
    * keeps the same relative order with holes — readers sort by
    * `pos`, not index into it).
    *
    * 100 TB shape: the within-source rank is a per-source window (one
    * sort per source — at extreme per-source volume swap in
    * [[rankBy]] per source); the source ordinal table is
    * dimension-sized and broadcast. Reproducible in (seed), like
    * every md5-keyed op here.
    */
  def interleaveBySource(
      df: DataFrame, idCol: String, groupCol: String, seed: Long,
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null sources are excluded UP FRONT: engines disagree on null
    // sort position (Spark windows default NULLS FIRST, DuckDB ORDER
    // BY defaults NULLS LAST), so a null group in the ordinal window
    // would shift every source's ordinal on one engine only — and
    // the equi-join below would drop the null rows anyway. Excluding
    // them first makes the ordinals engine-identical by construction.
    val nn = df.filter(col(groupCol).isNotNull)
    val srcIdx = nn.select(col(groupCol)).distinct()
      .withColumn("__src_idx",
        row_number().over(Window.orderBy(col(groupCol))).cast("long"))
    val nSrc = srcIdx.agg(max(col("__src_idx")).as("__n_src"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__sk"), col(idCol))
    nn.select(col(idCol), col(groupCol))
      .withColumn("__sk",
        md5(concat(col(idCol).cast("string"), lit(":" + seed))))
      .withColumn("__rank", row_number().over(w).cast("long"))
      .join(broadcast(srcIdx), Seq(groupCol))
      .crossJoin(broadcast(nSrc))
      .select(col(idCol), col(groupCol),
        ((col("__rank") - 1L) * col("__n_src") + col("__src_idx") - 1L)
          .as("pos"))
  }

  /** DuckDB rendering of [[interleaveBySource]] over
    * `documents(doc_id, source)` restricted by `whereClause`.
    */
  def interleaveBySourceSql(whereClause: String, seed: Long): String =
    s"""WITH d AS (SELECT doc_id, source FROM documents $whereClause),
       |si AS (SELECT source,
       |    CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS src_idx
       |  FROM (SELECT DISTINCT source FROM d) q),
       |ns AS (SELECT max(src_idx) AS n_src FROM si),
       |r AS (SELECT doc_id, source,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':$seed'), doc_id)
       |      AS BIGINT) AS rnk
       |  FROM d)
       |SELECT r.doc_id, r.source,
       |  (r.rnk - 1) * ns.n_src + si.src_idx - 1 AS pos
       |FROM r JOIN si USING (source), ns
       |ORDER BY pos""".stripMargin
}
