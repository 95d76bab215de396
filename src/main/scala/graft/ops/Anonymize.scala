package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity by global recoding — the privacy gate a training-data
  * release runs before quasi-identifiers (location × segment ×
  * numeric attribute) leave the house: every published equivalence
  * class must contain at least k individuals, achieved by walking a
  * fixed GENERALIZATION LADDER (Samarati/Sweeney's full-domain
  * generalization, one lattice path): each level coarsens the
  * quasi-identifiers further (wider numeric buckets, then suppressing
  * whole columns to `*`), and the chosen level is the LEAST one whose
  * smallest class reaches k — minimal information loss subject to the
  * privacy floor. Callers terminate the ladder with a fully
  * suppressed level, which always satisfies any k ≤ row count, so the
  * walk cannot fail.
  *
  * Scale shape: one map-combined keyed census per level (the level
  * count is a small constant — the ladder, not the data), a
  * level-count-sized min table, a 1-row chosen-level broadcast, and
  * one broadcast join to filter the published census. No shuffle
  * exceeds class cardinality; nothing row-sized survives the first
  * censuses. Determinism: class labels are strings built by integer
  * arithmetic only, so the hash gate pins every cell.
  *
  * Output: the per-class census AT the chosen level —
  * `(level, <generalized qid columns…>, n_rows)`.
  */
object Anonymize {

  /** Walk the ladder: `levels(i)` lists the generalized
    * quasi-identifier columns (each aliased — every level must
    * produce the SAME column names) for level i, least-general
    * first. Returns the census at the least level whose minimum
    * class size is ≥ k (empty only if no level qualifies — always
    * terminate the ladder with full suppression).
    */
  def kAnonLadder(
      df: DataFrame, levels: Seq[Seq[Column]], k: Long): DataFrame = {
    require(levels.nonEmpty, "empty generalization ladder")
    require(k >= 1, s"k $k must be >= 1")
    val censuses = levels.zipWithIndex.map { case (cols, l) =>
      df.groupBy(cols: _*).agg(count(lit(1)).as("n_rows"))
        .withColumn("level", lit(l))
    }
    val all = censuses.reduce(_.unionByName(_))
    val chosen = all.groupBy(col("level"))
      .agg(min(col("n_rows")).as("min_n"))
      .filter(col("min_n") >= k)
      .agg(min(col("level")).as("level"))
    all.join(broadcast(chosen), Seq("level"))
  }

  /** Right-to-be-forgotten rewrite planning — the GDPR/CCPA erasure
    * pass over an immutable-file lake: deletes can't happen in place,
    * so the real cost is WHICH shards must be rewritten and how much
    * clean data each rewrite drags along. Output, per shard: total
    * rows, rows belonging to erased keys, and the rewrite verdict —
    * the work order a compaction service executes, and the audit row
    * a privacy office wants (hash-gateable, joinable against the
    * request log).
    *
    * Scale shape: the erasure batch is small by nature (requests, not
    * data) — it BROADCASTS into one semi join; both censuses are
    * map-combined shard aggregates; output is manifest-sized. A lake
    * that shards BY the subject key (the layout this planner's own
    * numbers argue for) localizes each request to one shard; sharding
    * by arrival time smears every request across all of them.
    */
  def erasurePlan(
      df: DataFrame, shard: Column, keyCol: String,
      deletes: DataFrame): DataFrame = {
    val rows = df.select(shard.as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n_rows"))
    val hits = df.select(shard.as("shard"), col(keyCol))
      .join(broadcast(deletes.select(col(keyCol)).distinct()),
        Seq(keyCol), "left_semi")
      .groupBy(col("shard")).agg(count(lit(1)).as("n_hits"))
    rows.join(hits, Seq("shard"), "left")
      .select(col("shard"), col("n_rows"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0L).as("rewrite"))
  }

  /** DuckDB rendering of [[erasurePlan]]: `fromClause` supplies the
    * data rows, `shardExpr`/`keyExpr` the shard id and subject key,
    * `deleteClause` the erased-key rows (one column named like
    * `keyExpr`'s alias `k`).
    */
  def erasurePlanSql(
      fromClause: String, shardExpr: String, keyExpr: String,
      deleteClause: String): String =
    s"""WITH base AS (SELECT $shardExpr AS shard, $keyExpr AS k
       |  FROM $fromClause),
       |dels AS (SELECT DISTINCT k FROM ($deleteClause) d),
       |rows_c AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_rows
       |  FROM base GROUP BY 1),
       |hits_c AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM base WHERE k IN (SELECT k FROM dels) GROUP BY 1)
       |SELECT r.shard, r.n_rows, COALESCE(h.n_hits, 0) AS n_hits,
       |  COALESCE(h.n_hits, 0) > 0 AS rewrite
       |FROM rows_c r LEFT JOIN hits_c h ON r.shard = h.shard""".stripMargin

  /** l-diversity on top of the k-anonymity ladder — the stronger
    * release gate: a k-sized equivalence class whose SENSITIVE
    * attribute is constant still leaks it (the homogeneity attack
    * k-anonymity misses), so the chosen level must ALSO give every
    * class at least `l` distinct sensitive values
    * (Machanavajjhala et al.'s distinct l-diversity). Same ladder
    * walk, same scale shape plus one exact distinct census per level
    * — keyed by (class, sensitive value), so no shuffle exceeds the
    * class-value pair count. Output census carries `n_rows` and
    * `n_sensitive` per published class.
    */
  def lDiverseLadder(
      df: DataFrame, levels: Seq[Seq[Column]], sensitive: Column,
      k: Long, l: Long): DataFrame = {
    require(levels.nonEmpty, "empty generalization ladder")
    require(k >= 1 && l >= 1, s"k $k and l $l must be >= 1")
    val censuses = levels.zipWithIndex.map { case (cols, lv) =>
      df.groupBy(cols: _*).agg(count(lit(1)).as("n_rows"),
        countDistinct(sensitive).as("n_sensitive"))
        .withColumn("level", lit(lv))
    }
    val all = censuses.reduce(_.unionByName(_))
    val chosen = all.groupBy(col("level"))
      .agg(min(col("n_rows")).as("min_n"),
        min(col("n_sensitive")).as("min_s"))
      .filter(col("min_n") >= k && col("min_s") >= l)
      .agg(min(col("level")).as("level"))
    all.join(broadcast(chosen), Seq("level"))
  }

  /** DuckDB rendering of [[lDiverseLadder]] (see [[kAnonLadderSql]]
    * for the argument contract; `sensitiveExpr` is a SQL expression).
    */
  def lDiverseLadderSql(
      fromClause: String, levels: Seq[Seq[(String, String)]],
      sensitiveExpr: String, k: Long, l: Long,
      orderBy: Seq[String]): String = {
    val census = levels.zipWithIndex.map { case (cols, lv) =>
      val sel = cols.map { case (e, a) => s"$e AS $a" }.mkString(", ")
      val grp = cols.map(_._2).mkString(", ")
      s"""SELECT $lv AS level, $sel, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT $sensitiveExpr) AS BIGINT) AS n_sensitive
         |FROM $fromClause GROUP BY $grp""".stripMargin
    }.mkString("\nUNION ALL\n")
    val aliases = levels.head.map(_._2).mkString(", ")
    s"""WITH census AS MATERIALIZED (
       |$census),
       |chosen AS (SELECT MIN(level) AS level FROM (
       |  SELECT level, MIN(n_rows) AS min_n, MIN(n_sensitive) AS min_s
       |  FROM census GROUP BY level) m
       |  WHERE min_n >= $k AND min_s >= $l)
       |SELECT c.level, $aliases, n_rows, n_sensitive
       |FROM census c JOIN chosen ON c.level = chosen.level
       |ORDER BY ${orderBy.mkString(", ")}""".stripMargin
  }

  /** DuckDB rendering of [[kAnonLadder]]: `levels(i)` lists
    * `(sqlExpr, alias)` pairs — aliases must match the Spark side's
    * column names and be identical across levels. `orderBy` columns
    * are appended verbatim.
    */
  def kAnonLadderSql(
      fromClause: String, levels: Seq[Seq[(String, String)]], k: Long,
      orderBy: Seq[String]): String = {
    val census = levels.zipWithIndex.map { case (cols, l) =>
      val sel = cols.map { case (e, a) => s"$e AS $a" }.mkString(", ")
      val grp = cols.map(_._2).mkString(", ")
      s"""SELECT $l AS level, $sel, CAST(count(*) AS BIGINT) AS n_rows
         |FROM $fromClause GROUP BY $grp""".stripMargin
    }.mkString("\nUNION ALL\n")
    val aliases = levels.head.map(_._2).mkString(", ")
    s"""WITH census AS MATERIALIZED (
       |$census),
       |chosen AS (SELECT MIN(level) AS level FROM (
       |  SELECT level, MIN(n_rows) AS min_n FROM census GROUP BY level) m
       |  WHERE min_n >= $k)
       |SELECT c.level, $aliases, n_rows
       |FROM census c JOIN chosen ON c.level = chosen.level
       |ORDER BY ${orderBy.mkString(", ")}""".stripMargin
  }
}
