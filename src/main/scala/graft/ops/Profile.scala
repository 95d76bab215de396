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
