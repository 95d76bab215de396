package graft.ann

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway plan inspector for the NN-descent round internals —
  * prints the physical plan of one descent round's candidate topK and
  * one beam-search expand, the intermediate actions the committed
  * final-frame explains cannot show. Not part of any query path.
  */
object PlanScratch {
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
    
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 4 === 0)

    // replicate one nnDescent round body to see its plan
    val nodes = corpus.select(col("vec_id").as("node"), col("embedding").as("nv"),
        Ann.norm(col("embedding")).as("nn"))
      .filter(col("nn") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val src = nodes.select(col("node").as("src"), col("nv").as("sv"), col("nn").as("sn"))
    val dst = nodes.select(col("node").as("dst"), col("nv").as("dv"), col("nn").as("dn"))
    def dedupBySrc(pairs: org.apache.spark.sql.DataFrame) =
      pairs.repartition(col("src")).distinct()
    def topK(cands: org.apache.spark.sql.DataFrame) =
      Ann.heapRank(
        cands.join(dst, Seq("dst")).join(src, Seq("src"))
          .select(col("src").as("query_id"), col("dst").as("neighbor_id"),
            Ann.cosinePre(col("sv"), col("dv"), col("sn"), col("dn")).as("score")),
        "score", "double", 5, ascending = false)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    val init = (0 until 3).map { j =>
      val g = nodes.select(col("node"),
        (graft.ops.Sampling.bucket(col("node"), 42L + j) % 16).as("grp"))
      g.as("a").join(g.as("b"),
          col("a.grp") === col("b.grp") && col("a.node") =!= col("b.node"))
        .select(col("a.node").as("src"), col("b.node").as("dst"))
    }.reduce(_.unionByName(_))
    val e = topK(dedupBySrc(init)).localCheckpoint(true)
    val und = dedupBySrc(e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"))))
    val wedges = und.as("x").join(
        und.select(col("src").as("mid"), col("dst").as("dst2")).as("y"),
        col("x.src") === col("y.mid") && col("x.dst") =!= col("y.dst2"))
      .select(col("x.dst").as("src"), col("y.dst2").as("dst"))
    val round = topK(dedupBySrc(e.unionByName(wedges)))
    println("=== ROUND TOPK PLAN ===")
    println(round.queryExecution.executedPlan.toString.take(12000))
    round.write.format("noop").mode("overwrite").save()
    println("=== ROUND TOPK FINAL (AQE) ===")
    println(round.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
