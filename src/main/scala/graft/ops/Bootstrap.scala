package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass bootstrap resampling — error bars for corpus censuses
  * without a second scan. Every data-quality number this library
  * gates (a mean length, a duplicate rate, a quality score) is a
  * point estimate; the curation decision ("did the mean REALLY move
  * after the filter?") needs its sampling uncertainty. The classical
  * bootstrap draws `B` with-replacement resamples; the one-pass
  * formulation (Poisson bootstrap — Efron's multinomial weights
  * converge to independent Poisson(1) per row as n grows, the
  * standard trick for map-reduce bootstraps) gives each row a
  * per-resample multiplicity `w ~ Poisson(1)` derived DETERMINISTICALLY
  * from `md5(seed:b:id)` via the inverse CDF on the [[Sampling.bucket]]
  * space, so the whole audit is a pure function of (seed, ids) —
  * stable across runs, engines, partitionings, and the DuckDB oracle.
  *
  * 100 TB shape: map-only row expansion by `B` (the bootstrap's
  * intrinsic cost — `B·n` weight draws, fused into one whole-stage
  * codegen pass over ONE scan) into a `B`-group map-side-combined
  * aggregate. No joins, no windows, no second pass over the corpus;
  * `B` rows come out. Truncation: multiplicities cap at
  * `PoisCum.length` (P(X > 9) < 1.2e-7 — under one row in 8 million).
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF, floored onto the 1e6 bucket space:
    * `PoisCum(k) = floor(P(X <= k) * 1e6)`, k = 0..8. Driver-computed
    * once and spliced as LITERALS into both engines' expressions, so
    * the inverse-CDF lookup is value-identical by construction.
    */
  private[graft] val PoisCum: Seq[Long] = {
    val pmf = Iterator.iterate(math.exp(-1.0) -> 0) {
      case (p, k) => (p / (k + 1), k + 1)
    }
    pmf.map(_._1).scanLeft(0.0)(_ + _).drop(1).take(9)
      .map(c => math.floor(c * 1e6).toLong).toSeq
  }

  /** Poisson(1) multiplicity of row `id` in resample `b`: the number
    * of thresholds at or below `bucket(md5(seed:b:id))`.
    */
  private def weight(id: Column, b: Column, seed: Long): Column = {
    val u = Sampling.bucket(concat(b.cast("string"), lit(":"), id.cast("string")), seed)
    PoisCum.zipWithIndex.foldRight(lit(PoisCum.length.toLong)) {
      case ((cum, k), rest) => when(u < cum, lit(k.toLong)).otherwise(rest)
    }
  }

  private def weightSql(idExpr: String, seed: Long): String = {
    val u = Sampling.bucketSql(s"'' || b || ':' || CAST($idExpr AS VARCHAR)", seed)
    val arms = PoisCum.zipWithIndex
      .map { case (cum, k) => s"WHEN $u < $cum THEN $k" }
      .mkString(" ")
    s"CASE $arms ELSE ${PoisCum.length} END"
  }

  /** `B` bootstrap resamples of the mean of integer column `xCol` in
    * one pass: `(b, n_eff, sum_wx, mean_micro)` per resample, with
    * `mean_micro = sum(w·x)·10^6 div sum(w)`. The spread of the `B`
    * means IS the sampling distribution of the census mean — read the
    * CI off the extremes/quantiles of these `B` rows (they are few by
    * construction; that read is driver-free here, the rows stay a
    * DataFrame). `xCol` must already be integer-valued (quantize
    * floats upstream with the library floor device).
    *
    * `keyCol` chooses the resampling UNIT. The row id gives the
    * classic row bootstrap. A cluster column (source, domain, crawl)
    * gives the CLUSTER bootstrap — all of a cluster's rows enter
    * resample `b` with the same weight, so the spread reflects
    * between-cluster variation: the statistically honest error bar
    * when rows within a source are correlated (in a crawled corpus
    * they always are — the row bootstrap's interval is too narrow by
    * ~sqrt(design effect) there). Either way the weight is a pure
    * function of (seed, b, key): no cluster census, no join.
    *
    * `xCol` must be NON-NEGATIVE for oracle parity: `mean_micro`
    * divides with Spark's `div` (truncates toward zero) and DuckDB's
    * `//` (floors) — identical on non-negative sums, divergent on
    * negative ones. Shift negative metrics by a constant upstream
    * (the library offset device) rather than relying on the division.
    */
  def resampleMeans(
      df: DataFrame, keyCol: String, xCol: String, b: Int = 32,
      seed: Long = 42L): DataFrame = {
    require(b >= 1, s"resamples $b must be >= 1")
    df.select(col(keyCol).as("__id"), col(xCol).cast("long").as("__x"))
      .select(col("__id"), col("__x"),
        explode(sequence(lit(0L), lit(b - 1L))).as("b"))
      .select(col("b"), col("__x"),
        weight(col("__id"), col("b"), seed).as("__w"))
      .groupBy(col("b"))
      .agg(sum(col("__w")).as("n_eff"),
        sum(col("__w") * col("__x")).as("sum_wx"))
      .select(col("b"), col("n_eff"), col("sum_wx"),
        expr("(sum_wx * 1000000L) div greatest(n_eff, 1L)").as("mean_micro"))
  }

  /** DuckDB rendering of [[resampleMeans]] over `(keyExpr, xExpr)`
    * rows from `fromClause` — pass a cluster expression as `keyExpr`
    * for the cluster-bootstrap oracle.
    */
  def resampleMeansSql(
      fromClause: String, keyExpr: String, xExpr: String, b: Int = 32,
      seed: Long = 42L): String =
    s"""WITH r AS (SELECT b, CAST($xExpr AS BIGINT) AS x,
       |    ${weightSql(keyExpr, seed)} AS w
       |  FROM $fromClause, unnest(range(0, $b)) AS t(b)),
       |a AS (SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
       |    CAST(sum(w * x) AS BIGINT) AS sum_wx
       |  FROM r GROUP BY b)
       |SELECT b, n_eff, sum_wx,
       |  CAST((sum_wx * 1000000) // GREATEST(n_eff, 1) AS BIGINT)
       |    AS mean_micro
       |FROM a ORDER BY b""".stripMargin
}
