package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** MERGE-style upsert — the lakehouse write primitive (`MERGE INTO
  * target USING updates ON key WHEN MATCHED THEN UPDATE * WHEN NOT
  * MATCHED THEN INSERT *`), expressed as a plan instead of a table
  * format feature: the update batch wins on matched keys, inserts on
  * new keys, and untouched target rows pass through.
  *
  * Shape: ONE left-anti join of the target against the update keys
  * plus a union — the updates side is the small batch, so AQE
  * broadcasts the anti-join at typical batch sizes and the target
  * never shuffles. (Delta/Iceberg MERGE plans the same join; the
  * format layer adds file-level pruning and txn commit on top.)
  */
object Upsert {

  /** `target` upserted with `updates` on `keyCol` — schemas must
    * match by name (`unionByName` enforces it).
    */
  def upsert(target: DataFrame, updates: DataFrame, keyCol: String): DataFrame =
    updates.unionByName(
      target.join(updates.select(col(keyCol)), Seq(keyCol), "left_anti"))
}
