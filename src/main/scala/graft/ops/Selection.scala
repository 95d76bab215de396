package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Budget-bounded corpus selection: rank documents by a quality score
  * and keep the prefix that fits a global token budget — the
  * "take the best N tokens" curation step between scoring and
  * training-set assembly.
  *
  * The interesting part at scale is the EXACT GLOBAL running total.
  * The naive formulation — `sum(n_tokens) over (order by score desc)`
  * with no partition key — plans a single-partition window after a
  * global sort: one reducer sees the whole corpus. This operator uses
  * the classic distributed scan instead:
  *
  *   1. `repartitionByRange` on (score desc, id) — partition i holds
  *      strictly better-ranked rows than partition i+1, sorted within;
  *      materialized once (`localCheckpoint`) so both passes read the
  *      same blocks and the same range boundaries.
  *   2. pass 1: per-partition token totals — ONE ROW PER PARTITION is
  *      collected to the driver (the sanctioned bounded collect; at
  *      1000 executors this is kilobytes).
  *   3. prefix-sum the totals on the driver, broadcast the offset map.
  *   4. pass 2: a map-only `mapPartitions` adds each partition's
  *      offset to its sequential running count (the genuinely
  *      imperative per-partition arm — no shuffle, no window).
  *
  * Wall-clock: one range shuffle + two map passes, independent of
  * corpus size per partition. Determinism: the (score desc, id) rank
  * is a total order (ids unique), so `start_total` is exact and
  * partitioning-independent — the DuckDB oracle is the plain global
  * window ([[selectToBudgetSql]]), value-identical.
  *
  * A document is selected when its running count STARTS under the
  * budget (the same boundary rule as [[Packing.packSequences]]): the
  * boundary-straddling document is kept, so the selection always
  * reaches the budget, and growing the budget only ever ADDS rows
  * (monotone — spec-pinned).
  */
object Selection {

  /** Per-row output: `(id, n_tokens, start_total, selected)` —
    * `start_total` = tokens ranked strictly before this row.
    * `scoreCol` must be deterministic; ties break by id.
    */
  def selectToBudget(
      df: DataFrame, idCol: String, scoreCol: String, nTokensCol: String,
      budget: Long, partitions: Int = 0,
  ): DataFrame = {
    require(budget >= 0, s"budget $budget must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.select(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"),
        col(nTokensCol).cast("long").as("n_tokens"))
      .repartitionByRange(p, col("score").desc, col("id"))
      .sortWithinPartitions(col("score").desc, col("id"))
      .localCheckpoint() // both passes read the SAME partitioning
    // pass 1: bounded driver collect — one (pid, total) row per partition
    val totals = ranged
      .select(spark_partition_id().as("pid"), col("n_tokens"))
      .groupBy(col("pid")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until p).map { i =>
        val o = i -> acc
        acc += totals.getOrElse(i, 0L)
        o
      }.toMap
    }
    val offB = spark.sparkContext.broadcast(offsets)
    // pass 2: map-only sequential scan per partition + offset
    val out = ranged.as[(Long, Double, Long)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var run = offB.value.getOrElse(pid, 0L)
      it.map { case (id, _, n) =>
        val start = run
        run += n
        (id, n, start, start < budget)
      }
    }.toDF("id", "n_tokens", "start_total", "selected")
    out
  }

  /** DuckDB rendering of [[selectToBudget]] over `documents`
    * restricted by `whereClause`: `scoreExpr` / `nTokensExpr` are SQL
    * over the row (e.g. the quality-score and token-count twins).
    */
  def selectToBudgetSql(
      scoreExpr: String, nTokensExpr: String, budget: Long,
      whereClause: String = "",
  ): String =
    selectToBudgetOverSql(s"documents $whereClause", "doc_id",
      scoreExpr, nTokensExpr, budget)

  /** [[selectToBudgetSql]] over an arbitrary relation (a derived
    * scoring subquery, a CTE) instead of the `documents` table — the
    * composed-selection oracles (contrastive-score DSIR) ride here.
    */
  def selectToBudgetOverSql(
      fromSql: String, idExpr: String, scoreExpr: String,
      nTokensExpr: String, budget: Long,
  ): String =
    s"""WITH sized AS (SELECT $idExpr AS id,
       |    CAST($scoreExpr AS DOUBLE) AS score,
       |    CAST($nTokensExpr AS BIGINT) AS n_tokens
       |  FROM $fromSql),
       |cum AS (SELECT id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY score DESC, id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS BIGINT) AS start_total
       |  FROM sized)
       |SELECT id, n_tokens, start_total, start_total < $budget AS selected
       |FROM cum ORDER BY id""".stripMargin
}
