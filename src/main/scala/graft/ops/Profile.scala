package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: per-column row/null/distinct counts and min/max,
  * the data-quality audit every ingestion pipeline runs before
  * trusting a new drop. One `agg` computes every column's statistics
  * in a single pass over the data (Spark plans the multi-distinct
  * aggregate with one Expand — k streams over one scan, not k scans);
  * the single result row is then unpivoted driver-free with
  * `explode(array(struct…))`.
  *
  * min/max are computed on the NATIVE type (so numeric columns order
  * numerically, not lexically) and cast to string afterwards for the
  * uniform schema. Cross-engine string renderings of doubles and
  * timestamps differ — keep gated comparisons to integer/string
  * columns, or compare the typed values upstream.
  *
  * 100 TB shape: one scan + one Expand-widened exchange; no
  * driver-side iteration (the unpivot explodes a 1-row array). For
  * very wide tables profile in column batches to bound the Expand
  * multiplier.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: columns not in frame: $missing")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col("__total").as("n_rows"),
      (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_str"),
      col(s"__max_$c").as("max_str")))
    row.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Columnar-encoding advisor — the layout decision a 100 TB
    * parquet writer makes per column, surfaced as a census so the
    * pipeline can audit (and pin) it instead of trusting writer
    * defaults: dictionary encoding pays until the dictionary page
    * overflows or values stop repeating, run-length wins on
    * near-constant columns, and high-cardinality columns should skip
    * the failed-dictionary write-then-fallback cost entirely. Rules
    * (all-integer, engine-exact):
    *   - `rle`   when distinct <= 16 (near-constant — flags, enums);
    *   - `dict`  when distinct <= 65536 AND distinct*10 <= rows
    *     (repeats often enough; 64 Ki is the one-page id budget);
    *   - `plain` otherwise.
    * `width_milli` = floor(total string-rendered length * 1000 /
    * non-null count) — the size signal reviewers read beside the
    * recommendation (integer arithmetic; keep gated columns
    * int/string — double/timestamp renderings differ cross-engine).
    *
    * Same 100 TB shape as [[profile]]: ONE scan + one Expand-widened
    * multi-distinct aggregate for ALL columns, 1-row unpivot.
    */
  def encodingAdvisor(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "encodingAdvisor needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"encodingAdvisor: columns not in frame: $missing")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      sum(length(col(c).cast("string")).cast("long")).as(s"__len_$c")))
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col("__total").as("n_rows"),
      col(s"__nd_$c").as("n_distinct"),
      when(col(s"__cnt_$c") > 0,
        expr(s"(coalesce(__len_$c, 0L) * 1000) div __cnt_$c"))
        .otherwise(lit(0L)).as("width_milli"),
      when(col(s"__nd_$c") <= 16, lit("rle"))
        .when(col(s"__nd_$c") <= 65536 &&
          col(s"__nd_$c") * 10 <= col("__total"), lit("dict"))
        .otherwise(lit("plain")).as("encoding")))
    row.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** DuckDB rendering of [[encodingAdvisor]] (one UNION ALL branch
    * per column over `fromClause`).
    */
  def encodingAdvisorSql(fromClause: String, cols: Seq[String]): String = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(CASE WHEN count($c) > 0 THEN
         |      (COALESCE(SUM(length(CAST($c AS VARCHAR))), 0) * 1000)
         |        // count($c)
         |    ELSE 0 END AS BIGINT) AS width_milli,
         |  CASE WHEN count(DISTINCT $c) <= 16 THEN 'rle'
         |       WHEN count(DISTINCT $c) <= 65536
         |         AND count(DISTINCT $c) * 10 <= count(*) THEN 'dict'
         |       ELSE 'plain' END AS encoding
         |FROM $fromClause""".stripMargin
    cols.map(one).mkString("", "\nUNION ALL\n", "")
  }

  /** Heavy-hitter census over a join/group key — the skew diagnosis
    * run BEFORE committing a big join or aggregation to a key: the
    * top `k` key values by row count with each key's exact share of
    * the table. A key holding a double-digit share is the one that
    * will stall a 1000-executor shuffle on one reducer — the output
    * feeds directly into [[Skew]]'s salting decision or an AQE
    * skew-join review. Output: `(keyCols…, n_rows, share)` ordered by
    * count desc with the key as a total tie-break.
    *
    * Determinism: counts are exact; `share` is ONE IEEE division of
    * exactly-representable ints — engine-exact.
    *
    * 100 TB shape: one hash aggregate on the key (map-side combine —
    * the hot key itself pre-combines per partition, so the census
    * never suffers the skew it measures), the grand total re-derived
    * from the GROUP-sized census (never a second scan of the table),
    * and the top-k plans as TakeOrderedAndProject — a per-partition
    * heap, no global sort.
    */
  def heavyHitters(df: DataFrame, keyCols: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k $k must be positive")
    require(keyCols.nonEmpty, "heavyHitters needs at least one key column")
    val missing = keyCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"heavyHitters: columns not in frame: $missing")
    Seq("n_rows", "share", "__total").foreach(c =>
      require(!keyCols.contains(c),
        s"heavyHitters reserves column name $c; rename it in the input"))
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("__total"))
    counts.crossJoin(broadcast(tot))
      .select(keyCols.map(col) :+ col("n_rows") :+
        (col("n_rows").cast("double") / col("__total").cast("double"))
          .as("share"): _*)
      .orderBy(col("n_rows").desc +: keyCols.map(col): _*)
      .limit(k)
  }
}
