package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Incremental exact dedup: admit only the rows of an INCOMING batch
  * whose normalized-text fingerprint appears neither in the EXISTING
  * corpus nor earlier in the batch itself — the daily-ingest shape of
  * [[Dedup.exactDuplicates]] (a crawl drop lands against a corpus that
  * was already deduplicated; re-deduplicating the union from scratch
  * would rescan 100 TB to admit a 100 GB delta).
  *
  * Within-batch ties keep the minimum id (same first-occurrence
  * convention as the full-corpus operator), so repeated application
  * commutes: `dedup(corpus, a ++ b)` admits the same set as
  * `dedup(corpus, a); dedup(corpus ++ a', b)` for id-ordered batches.
  *
  * 100 TB shape: the existing side reduces to DISTINCT fingerprints —
  * one projection of the corpus, shuffled once on the fingerprint
  * (at 16 bytes/row, ~3 orders of magnitude smaller than the corpus
  * itself); the incoming batch left-anti joins on that key and
  * first-occurrence-filters itself with one more fingerprint shuffle.
  * Text never shuffles — only (fingerprint, id) pairs move. Store the
  * corpus fingerprint set as its own table to skip the corpus scan
  * entirely on every subsequent drop.
  */
object Incremental {

  /** Corpus version diff by normalized fingerprint: one row per
    * DISTINCT fingerprint across both versions with
    * `status ∈ {added, removed, kept}` — the release-note view of a
    * corpus refresh ("this crawl added 2M documents, dropped 40k,
    * kept 98%"), computed without moving any text: both versions
    * reduce to 16-byte fingerprint sets, full-outer joined on that
    * key. Aggregate the statuses for the summary; join `added` back
    * to the new version for the actual novel documents.
    */
  def versionDiff(v1: DataFrame, v2: DataFrame, textCol: String): DataFrame = {
    def fps(df: DataFrame) = df
      .select(TextFunctions.fingerprint(col(textCol)).as("fp")).distinct()
    fps(v1).select(col("fp"), lit(1).as("__v1"))
      .join(fps(v2).select(col("fp"), lit(1).as("__v2")), Seq("fp"), "full_outer")
      .select(col("fp"),
        when(col("__v1").isNotNull && col("__v2").isNotNull, lit("kept"))
          .when(col("__v2").isNotNull, lit("added"))
          .otherwise(lit("removed")).as("status"))
  }

  /** Surviving incoming rows (all original columns), one per novel
    * fingerprint: not in `existing`, minimum `idCol` within the batch.
    */
  def dedupIncrement(
      existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
  ): DataFrame = {
    Seq("__fp", "__keep_id").foreach(c =>
      require(!incoming.columns.contains(c),
        s"dedupIncrement reserves column name $c; rename it in the input"))
    val seen = existing
      .select(TextFunctions.fingerprint(col(textCol)).as("__fp"))
      .distinct()
    val tagged = incoming
      .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
    val novel = tagged.join(seen, Seq("__fp"), "left_anti")
    // first occurrence within the batch: min id per fingerprint.
    // keeper columns are RENAMED before the join — both sides share
    // lineage, and same-name dataset-qualified columns on a self-join
    // resolve to an ambiguous (trivially-true) predicate
    val keepers = novel.groupBy(col("__fp"))
      .agg(min(col(idCol)).as("__keep_id"))
      .withColumnRenamed("__fp", "__keep_fp")
    novel.join(keepers,
      col("__fp") === col("__keep_fp") && col(idCol) === col("__keep_id"))
      .select(incoming.columns.map(c => novel(c)): _*)
  }
}
