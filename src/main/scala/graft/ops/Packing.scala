package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign documents to
  * fixed-capacity token windows ("sequences") so a downstream writer
  * can concatenate each sequence's documents into one training
  * example.
  *
  * True greedy bin packing is inherently sequential (each placement
  * depends on every prior one), so a global exact answer cannot scale
  * past one partition. This operator uses the standard distributed
  * compromise: documents are sharded deterministically
  * (md5-bucketed, [[Sampling.bucket]] arithmetic — stable across
  * runs, engines and repartitioning), each shard packs independently
  * by running token count in id order, and a document is assigned to
  * the sequence where its running count STARTS (`floor(cum_before /
  * maxTokens)`). Documents that straddle a boundary are flagged
  * (`clipped`) for the writer to split or pad around — exactly the
  * bookkeeping a packing writer needs, with no sequential dependency.
  *
  * 100 TB shape: one shuffle into `shards` window partitions, one
  * window pass per shard — no global sort, no driver state. Size
  * `shards` ≫ executor count so the windows parallelize; each shard's
  * running count is independent, so adding shards scales linearly.
  * Sequence ids are globally unique as (shard, seq_in_shard).
  *
  * Deterministic and SQL-expressible ([[packSequencesSql]]): token
  * counts come from [[graft.text.TextFunctions.tokens]], cumulative
  * sums fold in deterministic id order with ties impossible (ids are
  * unique per shard).
  */
object Packing {

  /** Pack documents into `maxTokens`-capacity sequences within
    * deterministic shards. Output per input row:
    * (id, shard, n_tokens, seq_in_shard, start_offset, clipped).
    */
  def packSequences(
      df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, shards: Int, seed: Long = 42L,
  ): DataFrame = {
    require(maxTokens >= 1, s"maxTokens $maxTokens must be >= 1")
    require(shards >= 1, s"shards $shards must be >= 1")
    val sized = df.select(col(idCol).as("id"),
      (Sampling.bucket(col(idCol), seed) % shards).as("shard"),
      size(graft.text.TextFunctions.tokens(col(textCol)))
        .cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("start_total", col("cum") - col("n_tokens"))
      .select(col("id"), col("shard"), col("n_tokens"),
        floor(col("start_total") / maxTokens.toDouble).as("seq_in_shard"),
        (col("start_total") % maxTokens).as("start_offset"),
        // straddles the capacity boundary: the writer must split it
        // across sequences (or truncate/pad) — flagged, not hidden
        (col("start_total") % maxTokens + col("n_tokens") > maxTokens)
          .as("clipped"))
  }

  /** DuckDB rendering of [[packSequences]] over `documents(doc_id,
    * text)` restricted by `whereClause`.
    */
  def packSequencesSql(
      maxTokens: Int, shards: Int, seed: Long = 42L,
      whereClause: String = "",
  ): String = {
    val toks = graft.text.TextFunctions.tokensSql.replace("TXT", "text")
    val shard = s"(${Sampling.bucketSql("doc_id", seed)} % $shards)"
    s"""WITH sized AS (SELECT doc_id AS id, $shard AS shard,
       |    CAST(len($toks) AS BIGINT) AS n_tokens
       |  FROM documents $whereClause),
       |cum AS (SELECT id, shard, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS BIGINT) AS start_total
       |  FROM sized)
       |SELECT id, shard, n_tokens,
       |  CAST(floor(start_total / ${maxTokens.toDouble}) AS BIGINT) AS seq_in_shard,
       |  CAST(start_total % $maxTokens AS BIGINT) AS start_offset,
       |  start_total % $maxTokens + n_tokens > $maxTokens AS clipped
       |FROM cum ORDER BY id""".stripMargin
  }
}
