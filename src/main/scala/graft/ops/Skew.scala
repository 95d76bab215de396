package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (the classic 100 TB failure mode: one reducer owns the hot key).
  *
  * [[saltedJoin]] splits every hot-side key into `saltFactor` synthetic
  * sub-keys and replicates the small side `saltFactor`×, so a hot key's
  * rows spread over `saltFactor` reducers. AQE's skew-join handles
  * moderate skew automatically; salting is the deterministic heavy
  * hammer for known-pathological keys (and works under joins AQE can't
  * split, e.g. inside co-partitioned writes).
  *
  * The salt is derived from a hash of the large side's whole row — no
  * RNG, so plans stay deterministic and re-runnable.
  */
object Skew {

  /** A tiny frame re-materialized as a driver-local literal
    * (LocalRelation) — the lifecycle-free form of a hot-key
    * blocklist. The census behind a blocklist is a corpus-wide
    * aggregation, but its RESULT is bounded by contract (only keys
    * over the guard dial, and it rides a `broadcast()` downstream —
    * which collects to the driver anyway, so local materialization
    * adds no new scale constraint). Compared to the eager
    * `localCheckpoint` it replaces: no per-call executor blocks to
    * leak (repeated batch callers accumulated one checkpointed RDD
    * per call), and a streaming caller's micro-batches re-broadcast
    * a literal instead of re-aggregating the corpus-scale store.
    * Executes `df` NOW (one job) — callers skip it entirely when the
    * guard is disabled.
    */
  def localBlocklist(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner",
  ): DataFrame = {
    require(saltFactor > 0)
    val saltCol: Column =
      pmod(xxhash64(large.columns.map(c => col(c)): _*), lit(saltFactor))
    val l = large.withColumn("_salt", saltCol)
    val s = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(i => lit(i)): _*)))
    l.join(s, l(key) === s(key) && l("_salt") === s("_salt"), joinType)
      .drop(s(key)).drop(l("_salt")).drop(s("_salt"))
  }
}
