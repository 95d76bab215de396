package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changelog materialization — applying an ordered
  * insert/update/delete stream (the Debezium/binlog shape: one row
  * per mutation with a monotone sequence number) to a base snapshot.
  * [[Upsert]] is the special case with no deletes and one mutation
  * per key; this is the general lakehouse `MERGE` a streaming-ingest
  * table sees: keys mutate repeatedly within one batch, later ops
  * supersede earlier ones, and a trailing `D` must make the key
  * vanish even if the same batch inserted it.
  *
  * Scale shape: every step is CHANGELOG-sized, never snapshot-sized.
  * Last-writer-wins is a per-key `max(seq)` aggregate plus one
  * self-equi-join of the changelog against its own winners (two
  * passes over |Δ|, map-combined); the base participates in exactly
  * ONE left-anti join against the distinct touched keys (|Δ| keys —
  * AQE broadcasts it at typical batch sizes, so the 100 TB snapshot
  * never shuffles). Compare Delta/Iceberg MERGE: the format layer
  * adds file pruning and a transactional commit on top of this exact
  * plan.
  */
object Changelog {

  /** `base` with changelog `log` applied: per key the highest-`seqCol`
    * row wins; winners with `opCol` = "D" drop the key, any other op
    * upserts the winner's payload; untouched base rows pass through.
    *
    * Contract: `seqCol` is unique per key (a changelog position —
    * binlog offset, LSN, Kafka offset); `log`'s columns are `keyCol`,
    * `seqCol`, `opCol` plus exactly the base payload columns. The
    * output has the base schema.
    */
  def apply(base: DataFrame, log: DataFrame, keyCol: String,
      seqCol: String, opCol: String): DataFrame = {
    val winnerSeq = log.groupBy(col(keyCol))
      .agg(max(col(seqCol)).as(seqCol))
    val winners = log.join(winnerSeq, Seq(keyCol, seqCol))
    val upserts = winners.filter(col(opCol) =!= "D")
      .drop(seqCol, opCol)
      .select(base.columns.map(col).toIndexedSeq: _*)
    val untouched = base.join(
      log.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    upserts.unionByName(untouched)
  }

  /** Optimistic-concurrency conflict detection between two
    * transactions' changelogs — the row-level form of the check a
    * Delta/Iceberg commit runs before accepting the second of two
    * concurrent writers: a key BOTH transactions mutated cannot be
    * serialized by simply applying both logs (whichever commits
    * second silently clobbers the first). Output: one row per
    * contended key with each side's winning op and the conflict
    * kind — `delete_delete` (benign: both sides agree the key dies;
    * many engines auto-resolve it) vs `write_write` (needs retry or
    * merge). Keys touched by only one side never appear — they
    * serialize trivially.
    *
    * Scale: each side reduces to its winner set (per-key max-seq,
    * changelog-sized); the contended set is the equi-join of two
    * delta-sized frames — never snapshot-sized.
    */
  def conflicts(a: DataFrame, b: DataFrame, keyCol: String,
      seqCol: String, opCol: String): DataFrame = {
    def winner(log: DataFrame, pfx: String) = {
      val w = log.groupBy(col(keyCol)).agg(max(col(seqCol)).as(seqCol))
      log.join(w, Seq(keyCol, seqCol))
        .select(col(keyCol), col(opCol).as(s"${pfx}_op"))
    }
    winner(a, "a").join(winner(b, "b"), Seq(keyCol))
      .select(col(keyCol), col("a_op"), col("b_op"),
        when(col("a_op") === "D" && col("b_op") === "D",
          lit("delete_delete"))
          .otherwise(lit("write_write")).as("kind"))
  }

  /** Net-effect compaction of a changelog against base-key
    * membership: per touched key, the operation count, the winning
    * op, and the NET action a downstream writer must take —
    * `update` / `delete` when the key exists in the base,
    * `insert` when it does not, and `noop` for the
    * inserted-then-deleted-within-the-batch case (the churn a
    * naive per-op applier would write and immediately tombstone).
    * This is the changelog-topic compaction Kafka does per key,
    * made base-aware.
    *
    * Same scale shape as [[apply]]: one changelog aggregate, one
    * winner self-join, and the base appears only as a distinct-key
    * semi side (`base` here is already just the key column's frame —
    * pass `snapshot.select(keyCol)`; it is reduced to DISTINCT keys
    * internally so a 100 TB snapshot ships only its key set, and a
    * real deployment would hand in the primary-key index instead).
    */
  def netEffect(baseKeys: DataFrame, log: DataFrame, keyCol: String,
      seqCol: String, opCol: String): DataFrame = {
    val winnerSeq = log.groupBy(col(keyCol))
      .agg(max(col(seqCol)).as(seqCol), count(lit(1)).as("n_ops"))
    val winners = log.select(col(keyCol), col(seqCol), col(opCol))
      .join(winnerSeq, Seq(keyCol, seqCol))
    val inBase = baseKeys.select(col(keyCol)).distinct()
      .withColumn("__in_base", lit(true))
    winners.join(inBase, Seq(keyCol), "left")
      .select(col(keyCol), col("n_ops"),
        col(opCol).as("last_op"),
        when(coalesce(col("__in_base"), lit(false)),
          when(col(opCol) === "D", lit("delete")).otherwise(lit("update")))
          .otherwise(
            when(col(opCol) === "D", lit("noop")).otherwise(lit("insert")))
          .as("net"))
  }
}
