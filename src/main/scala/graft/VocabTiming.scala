package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway comparative timing: encode via map lookup vs linear scan. */
object VocabTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 32768
    val vocab = spark.range(k).select(
      concat(lit("t"), format_string("%06d", col("id"))).as("term"),
      (lit(100000L) - col("id")).as("n_total")).cache()
    vocab.count()
    val corpus = spark.range(2000).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(511)),
        i => when(i % 2 === 0,
          concat(lit("t"), format_string("%06d", pmod(col("id") * 7 + i, lit(k)))))
          .otherwise(concat(lit("oov"), i.cast("string"))))).as("text")).cache()
    corpus.count()
    def time(label: String)(f: => Any): Unit = {
      val runs = (1 to 3).map { _ => val t0 = System.nanoTime(); val n = f; (System.nanoTime()-t0)/1e9 -> n }
      println(f"$label best=${runs.map(_._1).min}%.2fs res=${runs.head._2}")
    }
    time("explode-only") {
      corpus.select(col("doc_id"), posexplode(graft.text.TextFunctions.tokens(lower(col("text")))).as(Seq("pos", "__tok")))
        .agg(sum("pos")).collect()(0).get(0)
    }
    time("explode-sumlen") {
      corpus.select(col("doc_id"), posexplode(graft.text.TextFunctions.tokens(lower(col("text")))).as(Seq("pos", "__tok")))
        .agg(sum(length(col("__tok")))).collect()(0).get(0)
    }
    time("encode-map  ") { graft.text.Vocab.encode(corpus, "doc_id", "text", vocab).agg(sum("token_id")).collect()(0).getLong(0) }
    time("encode-scan ") { graft.text.Vocab.encodeViaScan(corpus, "doc_id", "text", vocab).agg(sum("token_id")).collect()(0).getLong(0) }
    graft.text.Vocab.encode(corpus, "doc_id", "text", vocab).explain("formatted")
    spark.stop()
  }
}
