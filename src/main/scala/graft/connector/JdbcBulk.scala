package graft.connector

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Non-transactional bulk JDBC sink — the scale path for fact-table
  * appends where the reference's all-or-nothing guarantee is not
  * required. Executors write their partitions in parallel over their
  * own connections (`batchsize` rows per round trip); atomicity is
  * per-partition, so pair with an idempotent target (staging table,
  * or rerun-safe unique constraints).
  *
  * This complements [[Connector]]: transactional normalizing loads go
  * through the single-connection path; 100 TB appends go here.
  */
object JdbcBulk {

  def append(
      df: DataFrame,
      url: String,
      table: String,
      numPartitions: Int = 0,
      batchSize: Int = 10000,
  ): Unit = {
    val out = if (numPartitions > 0) df.repartition(numPartitions) else df
    out.write
      .mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, new java.util.Properties())
  }
}
