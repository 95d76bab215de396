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
}
