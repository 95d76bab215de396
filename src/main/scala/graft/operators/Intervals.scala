package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra: flatten a set of per-key intervals into its
  * union of disjoint spans — the classic "merge overlapping
  * intervals" (coverage windows, maintenance blackouts, padded
  * sessions). Inclusive-end semantics: intervals that merely TOUCH
  * (`[0,10]`,`[10,20]`) merge; only a strict gap starts a new span.
  *
  * Algorithm: per key, sort by `(lo, hi)`; a row starts a new span
  * iff its `lo` exceeds the running max of all previous `hi` (the
  * sweep line); the running flag-sum numbers the spans, one groupBy
  * collapses them. Rows with `hi < lo` are empty and dropped.
  *
  * Determinism: a row among equal `(lo, hi)` duplicates can never
  * flag after the first (its `lo` is covered by its twin's `hi`), so
  * span numbering is independent of tie order — engine-exact with
  * all-integer bounds.
  *
  * 100 TB shape: identical to sessionization — ONE shuffle on the
  * key; both window phases (running max, running sum) share the
  * single `(key) / (lo, hi)` sort. Per-reducer state is one key's
  * interval list; a pathologically hot key is the known limit, as
  * with any per-key sweep.
  */
object Intervals {

  /** Returns `(keyCol, merge_seq, loCol, hiCol, n_merged)`: one row
    * per disjoint span, `merge_seq` numbering spans 1-based in lo
    * order within each key.
    */
  def mergeIntervals(
      df: DataFrame, keyCol: String, loCol: String, hiCol: String,
  ): DataFrame = {
    Seq("__new", "merge_seq", "n_merged").foreach(c =>
      require(!df.columns.contains(c),
        s"mergeIntervals reserves column name $c; rename it in the input"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(loCol), col(hiCol))
    val prevMax = max(col(hiCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.filter(col(hiCol) >= col(loCol))
      .withColumn("__new",
        when(prevMax.isNull || col(loCol) > prevMax, 1L).otherwise(0L))
      .withColumn("merge_seq",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("merge_seq"))
      .agg(min(col(loCol)).as(loCol), max(col(hiCol)).as(hiCol),
        count(lit(1)).as("n_merged"))
  }
}
