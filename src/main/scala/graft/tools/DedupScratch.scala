package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for the d_dedup_* pair finder: times
  * the simhash signature pass, the full pair finder, and the CC step
  * separately so the heavy stage can be attributed. Not a query path.
  */
object DedupScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (rep <- 1 to 3) {
      spark.catalog.clearCache()
      println(s"--- rep $rep ---")
      time("simhash.count") {
        Dedup.simhash(docs, "doc_id", "text").count()
      }
      spark.catalog.clearCache()
      time("pairs.count") {
        Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
          .count()
      }
      spark.catalog.clearCache()
      time("cc_lp.count") {
        Dedup.connectedComponents(
          Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3),
          "id_a", "id_b", driverThresholdEdges = 0L).count()
      }
    }
    spark.stop()
  }
}
