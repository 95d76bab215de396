package graft.ops

import org.apache.spark.sql.DataFrame
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
}
