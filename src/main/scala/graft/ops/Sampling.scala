package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling and train/test splitting for
  * corpus pipelines.
  *
  * Every decision derives from `md5(seed:id)` — a pure function of the
  * row's id, so membership is stable across runs, engines, cluster
  * sizes, and repartitioning (unlike `df.sample`, whose output depends
  * on partition layout). At 100 TB every operator here is map-only: no
  * shuffle, no state, codegen-friendly column expressions; the filter
  * composes with partition pruning and column pruning like any other
  * predicate. Fraction resolution is 1e-6 (the md5 bucket space).
  *
  * The identical arithmetic is SQL-expressible ([[bucketSql]]), so the
  * DuckDB oracle can verify sample membership value-exactly.
  */
object Sampling {

  /** Uniform bucket in [0, 1e6): top 60 bits of md5(seed:id), mod 1e6. */
  def bucket(id: Column, seed: Long): Column =
    conv(substring(md5(concat(lit(s"$seed:"), id.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 1000000L

  /** DuckDB rendering of [[bucket]] for SQL expression `idExpr`. */
  def bucketSql(idExpr: String, seed: Long): String =
    s"(CAST(('0x' || substr(md5('$seed:' || CAST($idExpr AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000)"

  private def thresh(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    math.floor(fraction * 1e6).toLong
  }

  /** Keep a deterministic `fraction` of rows, keyed on `idCol`. */
  def hashSample(
      df: DataFrame, idCol: String, fraction: Double, seed: Long = 42L,
  ): DataFrame =
    df.filter(bucket(col(idCol), seed) < thresh(fraction))

  /** Attach a `split` column: "test" for a deterministic
    * `testFraction` of rows, "train" for the rest. Membership depends
    * only on (seed, id) — rows keep their split when the corpus grows,
    * so train/test contamination can't creep in across dataset
    * versions.
    */
  def withSplit(
      df: DataFrame, idCol: String, testFraction: Double, seed: Long = 42L,
  ): DataFrame =
    df.withColumn("split",
      when(bucket(col(idCol), seed) < thresh(testFraction), lit("test"))
        .otherwise(lit("train")))

  /** Per-stratum sampling: each value of `stratumCol` keeps its own
    * fraction (`fractions`, else `defaultFraction`). The workhorse for
    * rebalancing a training mix — e.g. downsample the dominant
    * language, keep the rest. Map-only: the per-row threshold is a
    * CASE over broadcast-in-plan literals, not a join.
    */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      seed: Long = 42L,
  ): DataFrame = {
    val cutoff = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(thresh(defaultFraction))) { case (acc, (k, f)) =>
        when(col(stratumCol) === k, lit(thresh(f))).otherwise(acc)
      }
    df.filter(bucket(col(idCol), seed) < cutoff)
  }

  /** DuckDB rendering of [[stratifiedSample]]'s cutoff expression.
    * Stratum keys are SQL-escaped (doubled quotes), matching the
    * Spark side's Column equality for keys containing quotes.
    */
  def stratifiedCutoffSql(
      stratumExpr: String, fractions: Map[String, Double],
      defaultFraction: Double = 1.0,
  ): String =
    fractions.toSeq.sortBy(_._1).reverse
      .foldLeft(s"${thresh(defaultFraction)}") { case (acc, (k, f)) =>
        val escaped = k.replace("'", "''")
        s"CASE WHEN $stratumExpr = '$escaped' THEN ${thresh(f)} ELSE $acc END"
      }
}
