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

  /** The writer step: materialize each packed sequence as one row —
    * `(shard, seq_in_shard, n_docs, n_clipped, seq_tokens,
    * packed_chars, packed_text)` with member documents concatenated
    * in id order, `sep` between them (the EOS marker a trainer's
    * tokenizer expects). A document belongs to the sequence where it
    * STARTS ([[packSequences]]' assignment); boundary-straddlers
    * stay whole here and are counted in `n_clipped` — truncate/split
    * policy is the downstream writer's.
    *
    * Scale: this is the ONE place document text legitimately
    * shuffles — materialization IS the regrouping of text into its
    * output layout (exactly like
    * [[graft.sources.Sources.writeSharded]]); the assignment join
    * ships only `(id, shard, seq)`, and each output row is bounded
    * by `maxTokens` + one straddler regardless of document skew.
    */
  def materializeSequences(
      df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, shards: Int, seed: Long = 42L,
      sep: String = "<|eos|>",
  ): DataFrame = {
    val assign = packSequences(df, idCol, textCol, maxTokens, shards, seed)
      .select(col("id"), col("shard"), col("seq_in_shard"),
        col("n_tokens"), col("clipped"))
    df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(assign, Seq("id"))
      .groupBy(col("shard"), col("seq_in_shard"))
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(col("clipped").cast("int")).cast("int").as("n_clipped"),
        sum(col("n_tokens")).as("seq_tokens"),
        sort_array(collect_list(struct(col("id"), col("__text").as("t"))))
          .as("__docs"))
      .select(col("shard"), col("seq_in_shard"), col("n_docs"),
        col("n_clipped"), col("seq_tokens"),
        array_join(transform(col("__docs"), d => d("t")), sep)
          .as("packed_text"))
      .withColumn("packed_chars", length(col("packed_text")).cast("long"))
  }

  /** DuckDB rendering of [[materializeSequences]] over
    * `documents(doc_id, text)` restricted by `whereClause`.
    */
  def materializeSequencesSql(
      maxTokens: Int, shards: Int, seed: Long = 42L,
      sep: String = "<|eos|>", whereClause: String = "",
  ): String = {
    val assign = packSequencesSql(maxTokens, shards, seed, whereClause)
    val sq = sep.replace("'", "''")
    s"""WITH assign AS ($assign),
       |j AS (SELECT a.id, a.shard, a.seq_in_shard, a.n_tokens,
       |    a.clipped, d.text
       |  FROM assign a JOIN documents d ON a.id = d.doc_id)
       |SELECT shard, seq_in_shard,
       |  CAST(count(*) AS INT) AS n_docs,
       |  CAST(sum(CASE WHEN clipped THEN 1 ELSE 0 END) AS INT) AS n_clipped,
       |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       |  string_agg(text, '$sq' ORDER BY id) AS packed_text,
       |  CAST(length(string_agg(text, '$sq' ORDER BY id)) AS BIGINT)
       |    AS packed_chars
       |FROM j GROUP BY shard, seq_in_shard""".stripMargin
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

  /** Padding-waste census — the throughput number a LENGTH-BUCKETED
    * batching scheme is judged by (the alternative to [[packSequences]]'
    * concat-packing: bucket similar lengths together and pad to the
    * bucket ceiling). Each document rounds up to the next multiple of
    * `bucketSize` (capped at `maxLen`; longer docs truncate to
    * `maxLen` with zero pad); per bucket: document count, real
    * tokens, padded slots wasted, and the waste fraction in ppm
    * (`sum_waste·10^6 div (n_docs·bucket)` — all-integer, the padded
    * slot total is exactly `n_docs·bucket`). One map-side projection
    * + a ≤ `maxLen/bucketSize`-cell census. A pipeline compares this
    * against the packing path's clip rate to pick its batching
    * strategy per corpus.
    */
  def paddingWaste(
      docs: DataFrame, textCol: String,
      bucketSize: Int = 64, maxLen: Int = 1024): DataFrame = {
    require(bucketSize > 0 && maxLen % bucketSize == 0,
      s"maxLen $maxLen must be a positive multiple of bucketSize $bucketSize")
    docs
      .select(least(graft.text.TextFunctions.tokenCount(col(textCol)).cast("long"),
        lit(maxLen.toLong)).as("__len"))
      .select(col("__len"),
        (ceil(col("__len").cast("double") / bucketSize).cast("long") *
          bucketSize).as("bucket"))
      // empty docs round to bucket 0 — keep them visible as their own
      // zero-waste row rather than inventing a phantom bucketSize pad
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__len")).as("sum_tokens"),
        sum(col("bucket") - col("__len")).as("sum_waste"))
      .withColumn("waste_ppm",
        when(col("bucket") > 0,
          expr("sum_waste * 1000000L div (n_docs * bucket)"))
          .otherwise(lit(0L)))
  }

  /** DuckDB rendering of [[paddingWaste]] over `documents`
    * restricted by `whereClause`.
    */
  def paddingWasteSql(
      whereClause: String, bucketSize: Int = 64, maxLen: Int = 1024): String = {
    val toks = graft.text.TextFunctions.tokensSql.replace("TXT", "lower(text)")
    s"""WITH l AS (SELECT least(CAST(len($toks) AS BIGINT), $maxLen) AS ln
       |  FROM documents $whereClause),
       |b AS (SELECT ln,
       |    CAST(ceil(CAST(ln AS DOUBLE) / $bucketSize) AS BIGINT)
       |      * $bucketSize AS bucket FROM l),
       |c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(ln) AS BIGINT) AS sum_tokens,
       |    CAST(SUM(bucket - ln) AS BIGINT) AS sum_waste
       |  FROM b GROUP BY bucket)
       |SELECT bucket, n_docs, sum_tokens, sum_waste,
       |  CAST(CASE WHEN bucket > 0
       |    THEN sum_waste * 1000000 // (n_docs * bucket)
       |    ELSE 0 END AS BIGINT) AS waste_ppm
       |FROM c ORDER BY bucket""".stripMargin
  }
}
