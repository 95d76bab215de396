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
  def bucket(id: Column, seed: Long): Column = bucket(id, lit(seed))

  /** Column-seed form (the SQL front door's `graft_bucket(id, seed)`
    * routes here); renders `seed:id` identically to the literal form.
    */
  def bucket(id: Column, seed: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"),
      id.cast("string"))), 1, 15), 16, 10)
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

  /** Per-row acceptance sampling at a DATA-DRIVEN rate: keep a row iff
    * its bucket falls below `floor(rateCol · 1e6)` — [[hashSample]]
    * with the fraction coming from a column instead of a literal, for
    * rates computed upstream (a [[temperatureWeights]]-derived
    * per-language acceptance joined onto the corpus, a per-domain
    * quality prior). `rateCol` ∈ [0,1]; ≥ 1 keeps everything, ≤ 0
    * drops everything. Map-only and growth-stable like every sampler
    * here; membership is engine-exact whenever the rate column itself
    * is (floor of an exact double is exact).
    */
  def weightedSample(
      df: DataFrame, idCol: String, rateCol: String, seed: Long = 42L,
  ): DataFrame =
    df.filter(bucket(col(idCol), seed) <
      floor(col(rateCol) * lit(1000000.0)).cast("long"))

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

  /** Cap each group at an *expected* `cap` rows, keyed on `idCol`:
    * keep a row iff `bucket(id) · n_group < cap · 1e6`, i.e. a
    * deterministic `min(1, cap/n_group)` sampling rate per group.
    * Groups already at or under the cap keep every row. The dominant
    * use: bounding an over-represented source/domain in a training
    * mix without hand-tuning per-source fractions (cf.
    * [[stratifiedSample]], which wants explicit rates).
    *
    * All-integer arithmetic — no floating-point rate, so membership
    * is engine-exact for the oracle and immune to rounding drift.
    * (`bucket < 1e6` and group counts to ~9e12 stay inside Long.)
    *
    * 100 TB shape: one map-side-combined count per group (output =
    * #groups rows, tiny) broadcast back onto the corpus — a map-only
    * filter, no data shuffle. The input is scanned twice (count +
    * filter); persist upstream lineage if it is expensive.
    *
    * `broadcastCounts` controls the join strategy for the counts
    * frame. The default (true) force-broadcasts — right for the
    * common cardinalities (languages, sources: tens to thousands of
    * groups). Set it to FALSE when the group key is high-cardinality
    * (per-domain or per-URL-host caps over a web corpus reach tens of
    * millions of groups): a forced broadcast hint of an unbounded
    * frame is a driver OOM that AQE cannot override, whereas without
    * the hint Catalyst/AQE pick sort-merge vs broadcast from measured
    * sizes at runtime.
    */
  def capPerGroup(
      df: DataFrame, groupCol: String, idCol: String,
      cap: Long, seed: Long = 42L, broadcastCounts: Boolean = true,
  ): DataFrame = {
    require(cap > 0, s"cap $cap must be positive")
    Seq("__grp", "__n_group").foreach(c => require(!df.columns.contains(c),
      s"capPerGroup reserves column name $c; rename it in the input"))
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n_group"))
      .withColumnRenamed(groupCol, "__grp")
    val right = if (broadcastCounts) broadcast(counts) else counts
    // null-safe join: a NULL group is a group like any other — it gets
    // capped, not erased (an equi-join would null-reject its rows)
    df.join(right, col(groupCol) <=> col("__grp"))
      .filter(bucket(col(idCol), seed) * col("__n_group") < lit(cap * 1000000L))
      .drop("__grp", "__n_group")
  }

  /** DuckDB rendering of [[capPerGroup]] membership over table
    * `table`: a WHERE-ready predicate given the group-count CTE is
    * joined in as `n_group` (see the `p_cap_source` oracle for the
    * full shape).
    */
  def capPredicateSql(idExpr: String, cap: Long, seed: Long = 42L): String =
    s"${bucketSql(idExpr, seed)} * n_group < ${cap * 1000000L}"

  /** EXACTLY `min(k, group size)` rows per group, deterministically:
    * the rows whose `(bucket(id), id)` sorts smallest within their
    * group. [[capPerGroup]] bounds groups at an EXPECTED cap (rate
    * membership — right when a few percent of slack is fine and a
    * second pass is not); this pins a hard per-group budget — "exactly
    * 10k docs per language for the eval slice" — at the cost of a
    * group-keyed aggregate. Membership is stable in `(seed, k)`: the
    * selection for k=5 is a PREFIX of the selection for k=10 (same
    * order, longer cut), so growing a budget only ADDS rows.
    *
    * 100 TB shape: the selection runs as the bounded-heap [[TopK]]
    * aggregate — O(k) state per group, map-side truncation, shuffle
    * volume O(groups·k) ids, NO per-group sort (the window
    * `row_number` formulation sorts every group in full; the oracle
    * uses it — the two must agree). Selected ids then LEFT SEMI join
    * back to the corpus; at typical budgets (groups·k ≪ corpus) AQE
    * broadcasts the id set, so the corpus never shuffles.
    *
    * `idCol` must be integral, non-null, and unique within its group
    * (the dedup/curation id contract); a null id is never selected.
    */
  def sampleExactK(
      df: DataFrame, groupCol: String, idCol: String,
      k: Int, seed: Long = 42L,
  ): DataFrame = {
    require(k > 0, s"k $k must be positive")
    Seq("__grp", "__top", "__sel").foreach(c =>
      require(!df.columns.contains(c),
        s"sampleExactK reserves column name $c; rename it in the input"))
    // value = -bucket: TopK keeps the LARGEST (value, id-asc ties),
    // so negation selects the smallest (bucket, id) — the same order
    // the oracle's ORDER BY bucket, id produces. Buckets are < 1e6,
    // exactly representable as Double.
    val selected = df
      .groupBy(col(groupCol).as("__grp"))
      .agg(graft.functions.TopK.top_k(
        (-bucket(col(idCol), seed)).cast("double"),
        col(idCol).cast("long"), k).as("__top"))
      .select(col("__grp"), explode(col("__top")).as("__sel"))
      .select(col("__grp"), col("__sel")("id").as(idCol))
    df.join(selected,
      df(groupCol) <=> col("__grp") && df(idCol) === selected(idCol),
      "left_semi")
  }

  /** DuckDB rendering of [[sampleExactK]] membership over `table`
    * via the window formulation (`QUALIFY row_number() <= k`).
    */
  def sampleExactKSql(
      table: String, groupCol: String, idCol: String,
      k: Int, seed: Long = 42L, whereClause: String = "",
  ): String =
    s"""SELECT * FROM $table $whereClause
       |QUALIFY row_number() OVER (PARTITION BY $groupCol
       |  ORDER BY ${bucketSql(idCol, seed)}, $idCol) <= $k""".stripMargin

  /** Temperature-based sampling weights over the values of
    * `groupCol` — the multilingual rebalancing rule (share^alpha,
    * renormalized) used to up-weight low-resource languages in a
    * training mix (mBERT/XLM-R exponential smoothing; alpha = 1 keeps
    * the natural distribution, alpha → 0 approaches uniform). Output:
    * one row per group with `n_docs`, the normalized sampling
    * `weight`, and `upsample` (= weight / natural share — the
    * relative over/under-sampling factor the weight implies).
    *
    * Determinism: counts are exact integers; shares are single IEEE
    * divisions of exactly-representable integers; `alpha = 0.5` (the
    * default) uses `sqrt`, which IEEE 754 requires to be correctly
    * rounded — bit-identical on every engine, which is why the oracle
    * ([[temperatureWeightsSql]]) is registered for 0.5 only. The raw
    * weight is then quantized as `floor(raw * 1e15 + 0.5)` to BIGINT:
    * `raw ∈ [0,1]` so `raw * 1e15 ≤ 1e15 < 2^53` — the multiply and
    * add are single correctly-rounded IEEE ops on exactly-representable
    * operands (`1e15` and `0.5` are dyadic-exact; ulp at 1e15 is
    * 0.125), and floor is exact, so every engine computes the SAME
    * integer. The normalizer is then an integer sum — exact and
    * order-independent — and the final weight is one long→double cast
    * (correctly rounded by IEEE, identical everywhere) and one
    * division. No decimal casts, no string round-trips, no
    * engine-specific rounding anywhere in the chain. (The integer sum
    * bounds the group count at ~9.2e3 before BIGINT overflow —
    * languages/sources are tens to hundreds.) Other alphas go through
    * `pow`, whose last-ulp rounding is libm-specific — fine for
    * production use, not for cross-engine hashing.
    *
    * 100 TB shape: one map-side-combined count per group; everything
    * after operates on the #groups-row frame (languages, sources —
    * tens of rows), where the unpartitioned window is free. The
    * weights then drive [[stratifiedSample]] / [[capPerGroup]] as
    * plan literals — no shuffle ever touches the corpus itself.
    */
  def temperatureWeights(
      df: DataFrame, groupCol: String, alpha: Double = 0.5,
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha not in (0,1]")
    Seq("__total", "__share", "__raw").foreach(c =>
      require(!df.columns.contains(c),
        s"temperatureWeights reserves column name $c; rename it in the input"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("__total", sum(col("n_docs")).over(all))
      .withColumn("__share",
        col("n_docs").cast("double") / col("__total").cast("double"))
    val rawExpr =
      if (alpha == 0.5) sqrt(col("__share")) else pow(col("__share"), alpha)
    counts
      .withColumn("__raw",
        floor(rawExpr * lit(1e15) + lit(0.5)).cast("long"))
      .withColumn("weight",
        col("__raw").cast("double") /
          sum(col("__raw")).over(all).cast("double"))
      .withColumn("upsample", col("weight") / col("__share"))
      .select(col(groupCol), col("n_docs"), col("weight"), col("upsample"))
  }

  /** The CTE chain of [[temperatureWeightsSql]] without the final
    * SELECT — compose further queries (weighted sampling) on top of
    * the `x` CTE, which carries `(grp, n_docs, share, raw)`.
    */
  def temperatureWeightsCoreSql(
      table: String, groupExpr: String, whereClause: String = "",
  ): String =
    s"""c AS (SELECT $groupExpr AS grp, count(*) AS n_docs
       |  FROM $table $whereClause GROUP BY 1),
       |w AS (SELECT grp, n_docs,
       |  CAST(n_docs AS DOUBLE) / CAST(CAST(SUM(n_docs) OVER () AS BIGINT) AS DOUBLE) AS share
       |  FROM c),
       |x AS (SELECT grp, n_docs, share,
       |  CAST(floor(sqrt(share) * 1e15 + 0.5) AS BIGINT) AS raw
       |  FROM w)""".stripMargin

  /** DuckDB rendering of [[temperatureWeights]] at alpha = 0.5 over
    * `table`, grouping by `groupExpr` (aliased back to `groupAlias`).
    */
  def temperatureWeightsSql(
      table: String, groupExpr: String, groupAlias: String,
      whereClause: String = "",
  ): String =
    s"""WITH ${temperatureWeightsCoreSql(table, groupExpr, whereClause)}
       |SELECT grp AS $groupAlias, n_docs,
       |  CAST(raw AS DOUBLE) / CAST(CAST(SUM(raw) OVER () AS BIGINT) AS DOUBLE) AS weight,
       |  CAST(raw AS DOUBLE) / CAST(CAST(SUM(raw) OVER () AS BIGINT) AS DOUBLE) / share AS upsample
       |FROM x ORDER BY $groupAlias NULLS FIRST""".stripMargin

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

  /** Sampling-bias audit — does the hash sample actually look like
    * the population? Per category: population and sample counts,
    * their integer-ppm shares, and the share delta. A correct
    * id-keyed hash sample drifts only by sampling noise (deltas near
    * 0); a systematic delta means the sample key correlates with the
    * category — the silent way a "uniform" sample poisons every
    * downstream census. Run this after ANY sampled pipeline stage;
    * at 100 TB it costs two map-combined censuses over one scan
    * (the sample predicate is a pushed-down filter, not a separate
    * materialization) plus two 1-row totals broadcasts.
    *
    * Output: `(cat, n_pop, n_samp, pop_ppm, samp_ppm, delta_ppm)`.
    */
  def sampleSkewAudit(
      df: DataFrame, idCol: String, catCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    val flagged = df.select(col(catCol).as("cat"),
      when(bucket(col(idCol), seed) < thresh(fraction), 1L)
        .otherwise(0L).as("in_samp"))
    val census = flagged.groupBy(col("cat"))
      .agg(count(lit(1)).as("n_pop"), sum(col("in_samp")).as("n_samp"))
    val totals = census.agg(sum(col("n_pop")).as("tot_pop"),
      sum(col("n_samp")).as("tot_samp"))
    census.crossJoin(broadcast(totals))
      .select(col("cat"), col("n_pop"), col("n_samp"),
        expr("n_pop * 1000000L div tot_pop").as("pop_ppm"),
        expr("n_samp * 1000000L div tot_samp").as("samp_ppm"))
      .withColumn("delta_ppm", col("samp_ppm") - col("pop_ppm"))
  }

  /** DuckDB rendering of [[sampleSkewAudit]] over `(idExpr, catExpr)`
    * rows from `fromClause`.
    */
  def sampleSkewAuditSql(
      fromClause: String, idExpr: String, catExpr: String,
      fraction: Double, seed: Long = 42L): String = {
    val inSamp =
      s"CASE WHEN ${bucketSql(idExpr, seed)} < ${thresh(fraction)} " +
        "THEN 1 ELSE 0 END"
    s"""WITH c AS (SELECT $catExpr AS cat,
       |    CAST(count(*) AS BIGINT) AS n_pop,
       |    CAST(SUM($inSamp) AS BIGINT) AS n_samp
       |  FROM $fromClause GROUP BY 1),
       |t AS (SELECT SUM(n_pop) AS tot_pop, SUM(n_samp) AS tot_samp FROM c)
       |SELECT cat, n_pop, n_samp,
       |  CAST(n_pop * 1000000 // tot_pop AS BIGINT) AS pop_ppm,
       |  CAST(n_samp * 1000000 // tot_samp AS BIGINT) AS samp_ppm,
       |  CAST(n_samp * 1000000 // tot_samp - n_pop * 1000000 // tot_pop
       |    AS BIGINT) AS delta_ppm
       |FROM c, t ORDER BY cat""".stripMargin
  }
}
