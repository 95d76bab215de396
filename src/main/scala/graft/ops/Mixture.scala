package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mix planning: given target mixture WEIGHTS over a group
  * column (language, source, domain — the Pile/Dolma-style recipe)
  * and a total token budget, compute each group's available tokens,
  * token target, sampling rate, and epoch (repetition) factor. This
  * is the step between "curated corpus" and "sampler configuration":
  * its `rate_ppm` feeds [[Sampling.hashSample]]-style membership
  * directly, and `epochs_ppm > 1e6` tells the writer how many times
  * to repeat an UNDER-represented group to hit its target.
  *
  * Determinism: token counts are exact integer sums; each derived
  * column is a short chain of correctly-rounded IEEE ops on
  * exactly-cast operands, floored to an integer ppm — the SAME
  * integer on every engine ([[planSql]] mirrors the exact operation
  * order). Counts above 2^53 would lose the long→double cast
  * exactness — at that corpus size, plan per shard.
  *
  * 100 TB shape: one map-side-combined aggregate over the corpus
  * (output = #groups rows); the weight table rides as plan literals.
  * Nothing else moves.
  */
object Mixture {

  /** One row per group: `(groupCol, n_docs, n_tokens, target_tokens,
    * rate_ppm, epochs_ppm)` where `target_tokens =
    * floor(weight · tokenBudget)`, `rate_ppm` = parts-per-million of
    * the group to KEEP (capped at 1e6), and `epochs_ppm` = the
    * uncapped target/available ratio (2.5e6 = repeat the group 2.5×).
    * Groups absent from `weights` get `defaultWeight`; groups with
    * zero available tokens plan zero rate and zero epochs.
    */
  def plan(
      df: DataFrame, groupCol: String, textCol: String,
      weights: Map[String, Double], tokenBudget: Long,
      defaultWeight: Double = 0.0,
  ): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget $tokenBudget must be positive")
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0 && !w.isNaN && !w.isInfinity, s"bad weight $w"))
    val weight = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (g, w)) => when(col(groupCol) === lit(g), lit(w)).otherwise(acc)
    }
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.text.TextFunctions.tokenCount(col(textCol)).cast("long"))
          .as("n_tokens"))
      .withColumn("target_tokens",
        floor(weight * lit(tokenBudget.toDouble)))
      .withColumn("rate_ppm",
        when(col("n_tokens") > 0,
          floor(least(
            col("target_tokens").cast("double") / col("n_tokens").cast("double"),
            lit(1.0)) * lit(1e6)))
          .otherwise(lit(0L)))
      .withColumn("epochs_ppm",
        when(col("n_tokens") > 0,
          floor(col("target_tokens").cast("double") /
            col("n_tokens").cast("double") * lit(1e6)))
          .otherwise(lit(0L)))
  }

  /** Temperature-scaled mixture plan from the corpus' OWN token
    * distribution (the mT5/UniMax multilingual recipe): group g gets
    * weight `n_g^(1/T) / Σ_h n_h^(1/T)` — T=1 reproduces natural
    * proportions, T→∞ approaches uniform, the standard knob for
    * up-weighting low-resource groups without hand-written weight
    * maps. Output shape = [[plan]] plus the derived `weight` column.
    *
    * Sibling of [[Sampling.temperatureWeights]], not a duplicate: that
    * one turns DOC-count shares into per-row ACCEPTANCE rates (share^α
    * → [[Sampling.weightedSample]], down-sampling only); this one
    * turns TOKEN counts into a full mixture plan whose `epochs_ppm`
    * can exceed 1e6 — i.e. it feeds [[applyPlan]] and can REPEAT
    * under-represented groups, which an acceptance rate cannot.
    *
    * Determinism: token counts are exact integer sums; the
    * normalization Σ folds a GROUP-SORTED collected list (group
    * count is small by the mixture contract), so addition order is
    * fixed on both engines. The T=2 path computes `sqrt(n)` —
    * correctly rounded per IEEE 754 on every platform, hence
    * engine-exact and oracle-gateable. Arbitrary T goes through
    * `pow(n, 1/T)`, which Java and C libm may round 1 ulp apart — a
    * floor() at a boundary could then differ cross-engine, so only
    * the sqrt instance is hash-gated ([[planTemperatureSql]] mirrors
    * both). NULL group keys are excluded (they name no mixture
    * component; [[plan]] likewise reaches them only via
    * `defaultWeight`).
    *
    * 100 TB shape: identical to [[plan]] — one map-side-combined
    * aggregate, #groups rows out, a 1-row broadcast for the
    * normalizer. Nothing else moves.
    */
  def planTemperature(
      df: DataFrame, groupCol: String, textCol: String,
      temperature: Double, tokenBudget: Long,
  ): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget $tokenBudget must be positive")
    require(temperature > 0 && !temperature.isNaN && !temperature.isInfinity,
      s"temperature $temperature must be a positive finite number")
    def powered(c: org.apache.spark.sql.Column) =
      if (temperature == 2.0) sqrt(c)
      else pow(c, lit(1.0 / temperature))
    val census = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.text.TextFunctions.tokenCount(col(textCol)).cast("long"))
          .as("n_tokens"))
      .withColumn("pw", powered(col("n_tokens").cast("double")))
    val total = census.agg(
      aggregate(
        array_sort(collect_list(struct(col(groupCol).as("g"), col("pw")))),
        lit(0.0), (acc, x) => acc + x.getField("pw")).as("__tot"))
    census.crossJoin(broadcast(total))
      .withColumn("weight", col("pw") / col("__tot"))
      .withColumn("target_tokens", floor(col("weight") * lit(tokenBudget.toDouble)))
      .withColumn("rate_ppm",
        when(col("n_tokens") > 0,
          floor(least(
            col("target_tokens").cast("double") / col("n_tokens").cast("double"),
            lit(1.0)) * lit(1e6)))
          .otherwise(lit(0L)))
      .withColumn("epochs_ppm",
        when(col("n_tokens") > 0,
          floor(col("target_tokens").cast("double") /
            col("n_tokens").cast("double") * lit(1e6)))
          .otherwise(lit(0L)))
      .drop("pw", "__tot")
  }

  /** Materialize a [[plan]]: repeat each row of its group's epoch
    * factor — `epochs_ppm div 1e6` full copies, plus one more iff the
    * row's md5 bucket falls under the fractional part (deterministic
    * in `(idCol, seed)`, the [[Sampling.bucket]] rule) — emitting an
    * `epoch` index column (0-based) so downstream packing/writing
    * sees distinct rows. Groups planned at `epochs_ppm < 1e6`
    * downsample (most rows emit zero copies); groups above 1e6
    * upsample (every row emits ≥1). Groups absent from the plan are
    * dropped — the plan DEFINES the mix.
    *
    * `maxEpochs` fails fast (raise_error, before the explode
    * materializes) on a degenerate plan — a near-empty group with a
    * large target would otherwise replicate each row thousands of
    * times.
    *
    * 100 TB shape: the plan broadcasts (#groups rows), the explode
    * multiplies rows by the epoch factor — the output's intrinsic
    * size; no shuffle touches the corpus.
    */
  def applyPlan(
      df: DataFrame, groupCol: String, idCol: String, plan: DataFrame,
      seed: Long = 42L, maxEpochs: Long = 1000L,
  ): DataFrame = {
    require(maxEpochs > 0, s"maxEpochs $maxEpochs must be positive")
    Seq("__grp", "__ppm", "__total", "epoch").foreach(c =>
      require(!df.columns.contains(c),
        s"applyPlan reserves column name $c; rename it in the input"))
    val p = plan.select(col(groupCol).as("__grp"),
      col("epochs_ppm").cast("long").as("__ppm"))
    val total = expr("__ppm div 1000000") +
      when(Sampling.bucket(col(idCol), seed) < col("__ppm") % 1000000L, 1L)
        .otherwise(0L)
    val guarded = when(total > lit(maxEpochs),
      raise_error(concat(lit(s"applyPlan: epoch factor exceeds $maxEpochs for group "),
        col(groupCol).cast("string"),
        lit(" (raise maxEpochs or fix the plan)"))).cast("long"))
      .otherwise(total)
    df.join(broadcast(p), col(groupCol) <=> col("__grp"))
      .withColumn("__total", guarded)
      .filter(col("__total") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__total") - 1)))
      .drop("__grp", "__ppm", "__total")
  }

  /** DuckDB rendering of [[plan]] over `documents(lang, source,
    * text)`-shaped tables; `groupExpr` must be a column name.
    */
  def planSql(
      table: String, groupExpr: String, weights: Map[String, Double],
      tokenBudget: Long, defaultWeight: Double = 0.0,
      whereClause: String = "",
  ): String = {
    val toksLen = s"CAST(len(${graft.text.TextFunctions.tokensSql
      .replace("TXT", "text")}) AS BIGINT)"
    // CASE arms in the SAME fold order as the Column form: the last
    // map entry wins ties, so render arms reversed (the fold nests
    // later entries outermost). Group keys are rendered as
    // single-quoted SQL literals, so embedded quotes must double
    // (SQL-standard escaping) — the Spark side compares values
    // natively and needs none; without this a key like "pt'br" would
    // emit malformed oracle SQL and silently diverge the two engines.
    val arms = weights.toSeq.reverse
      .map { case (g, w) =>
        s"WHEN $groupExpr = '${g.replace("'", "''")}' THEN CAST($w AS DOUBLE)" }
      .mkString(" ")
    val weight = s"(CASE $arms ELSE CAST($defaultWeight AS DOUBLE) END)"
    s"""WITH a AS (SELECT $groupExpr, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum($toksLen) AS BIGINT) AS n_tokens
       |  FROM $table $whereClause GROUP BY 1),
       |t AS (SELECT *, CAST(floor($weight * CAST($tokenBudget AS DOUBLE)) AS BIGINT) AS target_tokens FROM a)
       |SELECT $groupExpr, n_docs, n_tokens, target_tokens,
       |  CASE WHEN n_tokens > 0 THEN CAST(floor(least(
       |    CAST(target_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 1.0) * 1e6) AS BIGINT)
       |    ELSE 0 END AS rate_ppm,
       |  CASE WHEN n_tokens > 0 THEN CAST(floor(
       |    CAST(target_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e6) AS BIGINT)
       |    ELSE 0 END AS epochs_ppm
       |FROM t""".stripMargin
  }

  /** DuckDB rendering of [[planTemperature]] over `documents`-shaped
    * tables; mirrors the Spark side operation for operation (sqrt for
    * T=2, pow otherwise — see [[planTemperature]] for why only the
    * sqrt instance is hash-gateable; the normalizer folds the SAME
    * group-sorted list).
    */
  def planTemperatureSql(
      table: String, groupExpr: String, temperature: Double,
      tokenBudget: Long, whereClause: String = "",
  ): String = {
    require(temperature > 0 && !temperature.isNaN && !temperature.isInfinity,
      s"temperature $temperature must be a positive finite number")
    val toksLen = s"CAST(len(${graft.text.TextFunctions.tokensSql
      .replace("TXT", "text")}) AS BIGINT)"
    val pw =
      if (temperature == 2.0) "sqrt(CAST(n_tokens AS DOUBLE))"
      else s"pow(CAST(n_tokens AS DOUBLE), ${1.0 / temperature})"
    val where =
      if (whereClause.isEmpty) s"WHERE $groupExpr IS NOT NULL"
      else s"$whereClause AND $groupExpr IS NOT NULL"
    s"""WITH a AS (SELECT $groupExpr, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum($toksLen) AS BIGINT) AS n_tokens
       |  FROM $table $where GROUP BY 1),
       |p AS (SELECT *, $pw AS pw FROM a),
       |tot AS (SELECT list_reduce(list_prepend(0.0, list(pw ORDER BY $groupExpr)),
       |  (acc, x) -> acc + x) AS t FROM p),
       |w AS (SELECT p.*, pw / t AS weight FROM p, tot)
       |SELECT $groupExpr, n_docs, n_tokens, weight,
       |  CAST(floor(weight * CAST($tokenBudget AS DOUBLE)) AS BIGINT) AS target_tokens,
       |  CASE WHEN n_tokens > 0 THEN CAST(floor(least(
       |    CAST(CAST(floor(weight * CAST($tokenBudget AS DOUBLE)) AS BIGINT) AS DOUBLE)
       |      / CAST(n_tokens AS DOUBLE), 1.0) * 1e6) AS BIGINT)
       |    ELSE 0 END AS rate_ppm,
       |  CASE WHEN n_tokens > 0 THEN CAST(floor(
       |    CAST(CAST(floor(weight * CAST($tokenBudget AS DOUBLE)) AS BIGINT) AS DOUBLE)
       |      / CAST(n_tokens AS DOUBLE) * 1e6) AS BIGINT)
       |    ELSE 0 END AS epochs_ppm
       |FROM w""".stripMargin
  }

  /** DuckDB rendering of [[applyPlan]]∘[[plan]] over `table`,
    * emitting `(idExpr, groupExpr, epoch)`.
    */
  def applyPlanSql(
      table: String, groupExpr: String, idExpr: String,
      planSqlStr: String, seed: Long = 42L): String = {
    val bucket = Sampling.bucketSql(s"t.$idExpr", seed)
    s"""WITH p AS ($planSqlStr),
       |d AS (SELECT t.$idExpr, t.$groupExpr,
       |  (p.epochs_ppm // 1000000) +
       |    (CASE WHEN $bucket < p.epochs_ppm % 1000000 THEN 1 ELSE 0 END) AS total
       |  FROM $table t JOIN p ON t.$groupExpr IS NOT DISTINCT FROM p.$groupExpr)
       |SELECT $idExpr, $groupExpr, unnest(range(0, total)) AS epoch
       |FROM d WHERE total > 0""".stripMargin
  }

  /** Waterfilling cap: solve for the LARGEST per-group token cap τ
    * whose capped total fits the budget — `Σ_g min(tokens_g, τ) ≤
    * tokenBudget`, τ maximal (up to the integer remainder, which
    * stays unallocated — the deterministic floor contract). This is
    * the allocation rule behind "cap the over-represented sources,
    * keep the small ones whole" mixture design: [[Sampling
    * .capPerGroup]] ENFORCES a given cap; this PLANS it from a
    * budget.
    *
    * Closed form over the ascending-sorted census (tokens, group):
    * the first rank k where `prefix(k−1) + (n−k+1)·tokens_k >
    * budget` pins τ = `(budget − prefix(k−1)) div (n−k+1)`; if no
    * rank violates, the whole corpus fits and τ = max tokens. At
    * that first violation `tokens_{k−1} ≤ τ < tokens_k` holds (ties
    * force the violation one rank earlier), so `min(tokens, τ)`
    * caps exactly the ranks ≥ k. All-integer once past the census:
    * the `div` is non-negative (truncation = floor on both engines).
    *
    * Output one row per group: `(groupCol, n_tokens, tau,
    * alloc_tokens, capped)` — same τ on every row (the dial a
    * sampler or [[Sampling.capPerGroup]] then enforces).
    *
    * 100 TB shape: ONE map-side-combined census over the corpus;
    * everything after runs on the #groups-sized frame — the
    * single-partition window is over groups (bounded: sources,
    * languages, domains), never documents.
    */
  def waterfillCaps(
      df: DataFrame, groupCol: String, textCol: String, tokenBudget: Long,
  ): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget $tokenBudget must be positive")
    import org.apache.spark.sql.expressions.Window
    val census = df.groupBy(col(groupCol))
      .agg(sum(graft.text.TextFunctions.tokenCount(col(textCol)).cast("long"))
        .as("n_tokens"))
    val w = Window.orderBy(col("n_tokens"), col(groupCol))
    val ranked = census
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prefix", sum(col("n_tokens"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = broadcast(census.agg(
      count(lit(1)).cast("long").as("n_groups"),
      max(col("n_tokens")).as("max_t")))
    // first violating rank via lexicographic struct-min; fall back to
    // max_t (the budget fits whole)
    val tau = broadcast(ranked.crossJoin(totals)
      .withColumn("prev_prefix", col("prefix") - col("n_tokens"))
      .withColumn("m", col("n_groups") - col("rn") + lit(1L))
      .agg(
        min(when(
          col("prev_prefix") + col("m") * col("n_tokens") > lit(tokenBudget),
          struct(col("rn"),
            expr(s"(${tokenBudget}L - prev_prefix) div m").as("tau"))))
          .as("v"),
        max(col("max_t")).as("max_t"))
      .select(coalesce(col("v.tau"), col("max_t")).as("tau")))
    census.crossJoin(tau)
      .select(col(groupCol), col("n_tokens"), col("tau"),
        least(col("n_tokens"), col("tau")).as("alloc_tokens"),
        (col("n_tokens") > col("tau")).as("capped"))
  }

  /** DuckDB rendering of [[waterfillCaps]] over `documents`-shaped
    * tables — the same census, ranks, first-violation τ, and capped
    * allocation.
    */
  def waterfillCapsSql(
      table: String, groupExpr: String, tokenBudget: Long,
      whereClause: String = "",
  ): String = {
    val toksLen = s"CAST(len(${graft.text.TextFunctions.tokensSql
      .replace("TXT", "text")}) AS BIGINT)"
    s"""WITH census AS (SELECT $groupExpr AS g,
       |    CAST(sum($toksLen) AS BIGINT) AS n_tokens
       |  FROM $table $whereClause GROUP BY 1),
       |r AS (SELECT g, n_tokens,
       |    CAST(row_number() OVER (ORDER BY n_tokens, g) AS BIGINT) AS rn,
       |    sum(n_tokens) OVER (ORDER BY n_tokens, g
       |      ROWS UNBOUNDED PRECEDING) AS prefix
       |  FROM census),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
       |    max(n_tokens) AS max_t FROM census),
       |tau AS (SELECT coalesce(
       |    arg_min(($tokenBudget - (prefix - n_tokens)) // (n_groups - rn + 1),
       |        rn)
       |      FILTER (WHERE (prefix - n_tokens)
       |        + (n_groups - rn + 1) * n_tokens > $tokenBudget),
       |    max(max_t)) AS tau
       |  FROM r CROSS JOIN tot)
       |SELECT g AS $groupExpr, n_tokens, CAST(tau AS BIGINT) AS tau,
       |  CAST(least(n_tokens, tau) AS BIGINT) AS alloc_tokens,
       |  n_tokens > tau AS capped
       |FROM census CROSS JOIN tau""".stripMargin
  }
}
