package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources and sinks (parquet / csv / json) with the
  * options that matter for correctness at scale.
  *
  * Scale notes: always pass an explicit schema for csv/json — schema
  * inference is a full extra pass over the data (at 100 TB, a 100 TB
  * pre-read). Writers partition by low-cardinality columns only
  * (partitionBy on a high-cardinality key creates a small-files
  * explosion); `maxRecordsPerFile` bounds file size skew.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema) // no inference pass
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
