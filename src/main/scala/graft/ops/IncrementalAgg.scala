package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view law a
  * 100 TB ingest pipeline lives by: per-key summary STATE is kept
  * mergeable (count / sum / min / max — each associative and
  * commutative), every new ingest batch folds into the state with
  * batch-sized + state-sized work, and the corpus is NEVER
  * recomputed. The correctness claim is the aggregation-homomorphism
  * identity
  *
  *   merge(stats(old), stats(delta)) ≡ stats(old ∪ delta)
  *
  * which the `s_incr_agg` gate proves cross-engine: the Spark side
  * computes the left-hand side (two slices summarized independently,
  * then merged), the DuckDB oracle computes the right-hand side
  * directly over the whole table — hash equality IS the law.
  *
  * Values are integer cents (`floor(x·100 + 0.5)` — engine-identical
  * per the repo's parity rules) so sums are exact BIGINT with no
  * float-order hazard. Derived measures (the mean) are computed FROM
  * the merged state by floor division, never carried in it — the
  * textbook distinction between algebraic aggregates (carry the
  * (sum, count) pair) and their final projection.
  *
  * Scale shape: each `stats` call is one map-combined keyed census
  * (partial aggregation makes the shuffle key-sized, not row-sized);
  * `merge` unions state frames — metadata-scale relative to the
  * corpus — and re-aggregates with the same combiners. Nothing here
  * is larger than the key cardinality after the first census.
  */
object IncrementalAgg {

  /** Per-key mergeable summary state over one slice:
    * `(keys…, n_rows, sum_cents, min_cents, max_cents)`.
    */
  def stats(df: DataFrame, keys: Seq[String], valCents: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(valCents).as("sum_cents"),
        min(valCents).as("min_cents"),
        max(valCents).as("max_cents"))

  /** Merge state frames (each a [[stats]] output over a disjoint or
    * overlapping slice — multiplicities add either way): component-
    * wise sum/sum/min/max per key.
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge of zero state frames")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))
  }

  /** Final projection from merged state: the derived mean in floor-
    * divided cents (exact BIGINT on both engines).
    */
  def withMean(state: DataFrame): DataFrame =
    state.withColumn("avg_cents", expr("sum_cents div n_rows"))

  /** Join-view maintenance — the DELTA ALGEBRA for materialized
    * joins: with `A' = A ∪ ΔA` and `B' = B ∪ ΔB` (bag union),
    *
    *   A' ⋈ B'  =  (A ⋈ B)  ∪  (ΔA ⋈ B)  ∪  (A ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)
    *
    * so a maintained join view absorbs an ingest batch with three
    * DELTA-SIDED joins — each bounded by |Δ| · fan-out, never a
    * re-join of the full tables. (The `A ⋈ B` term is the already-
    * materialized view; this helper recomputes it only because the
    * gate must produce the whole view to compare against the direct
    * oracle — a production pipeline unions the three delta terms
    * into the stored view.) Insert-only deltas here; deletions use
    * the same algebra with signed multiplicities.
    *
    * Scale shape: all four terms are hash equi-joins on the same
    * key, so they co-partition; the delta terms broadcast when Δ is
    * batch-sized. Bag semantics throughout (`unionByName` of inner
    * joins — multiplicities multiply exactly as the algebra says).
    */
  def maintainedJoin(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keyA: String, keyB: String): DataFrame = {
    def j(x: DataFrame, y: DataFrame) = x.join(y, col(keyA) === col(keyB))
    j(aOld, bOld)
      .unionByName(j(aDelta, bOld))
      .unionByName(j(aOld, bDelta))
      .unionByName(j(aDelta, bDelta))
  }

  /** DuckDB rendering of the RIGHT-hand side of the homomorphism
    * identity — the direct whole-table aggregate the merged state
    * must equal. `valCentsSql` must be the integral-cents expression.
    */
  def directSql(
      table: String, keys: Seq[String], valCentsSql: String,
      whereClause: String = ""): String = {
    val ks = keys.mkString(", ")
    s"""SELECT $ks, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(SUM($valCentsSql) AS BIGINT) AS sum_cents,
       |  CAST(MIN($valCentsSql) AS BIGINT) AS min_cents,
       |  CAST(MAX($valCentsSql) AS BIGINT) AS max_cents,
       |  CAST(SUM($valCentsSql) AS BIGINT) // CAST(count(*) AS BIGINT)
       |    AS avg_cents
       |FROM $table $whereClause
       |GROUP BY $ks ORDER BY $ks""".stripMargin
  }
}
