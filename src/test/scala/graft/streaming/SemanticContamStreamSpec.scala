package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Batch/stream equivalence for the streaming embedding-space
  * decontamination: the stateless stream-static scan must flag
  * exactly the pairs the batch construction flags, independent of
  * how the corpus is chopped into micro-batches.
  */
final case class Vec(id: Long, v: Array[Double])

class SemanticContamStreamSpec extends AnyFunSuite with SparkSpec {

  private def mkVec(seed: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(64)(r.nextDouble() - 0.5)
  }

  test("stream flags exactly the batch pairs, across micro-batch splits") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    // eval suite: 5 vectors; corpus: 3 planted leaks (scaled copies,
    // cosine exactly 1) + 12 unrelated vectors
    val eval = (0 until 5).map(i => Vec(100 + i, mkVec(i)))
    val leaks = Seq(0, 2, 4).map(i =>
      Vec(200 + i, mkVec(i).map(_ * 0.5)))
    val noise = (0 until 12).map(i => Vec(300 + i, mkVec(1000 + i)))
    val corpus = leaks ++ noise
    val evalDf = eval.toDF("id", "v")

    val input = MemoryStream[Vec]
    val query = Streams.semanticContamStream(
      input.toDF().toDF("id", "v"), evalDf, "id", "v", threshold = 0.95)
      .writeStream.format("memory").queryName("sem_contam")
      .outputMode("append").start()
    try {
      // three uneven micro-batches
      input.addData(corpus.take(2): _*)
      query.processAllAvailable()
      input.addData(corpus.slice(2, 9): _*)
      query.processAllAvailable()
      input.addData(corpus.drop(9): _*)
      query.processAllAvailable()

      def pairs(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("eval_id"),
          r.getAs[Double]("cos"))).toSeq.sorted
      val streamed = pairs(spark.table("sem_contam").collect())
      // the same function over the batch frame IS the batch scan
      val batch = pairs(Streams.semanticContamStream(
        corpus.toDF("id", "v"), evalDf, "id", "v", threshold = 0.95)
        .collect())
      assert(streamed == batch,
        s"stream flagged ${streamed.size} pairs, batch ${batch.size}")
      // exactly the planted leaks, each matched to its eval source
      assert(streamed.map(p => (p._1, p._2)).distinct.sorted ==
        Seq((200L, 100L), (202L, 102L), (204L, 104L)))
      // and the distinct flagged ids agree with the batch aggregate
      val agg = graft.ann.Ann.semanticContamination(
        corpus.toDF("id", "v"), evalDf, "id", "v", threshold = 0.95)
        .select("id").as[Long].collect().sorted.toSeq
      assert(agg == Seq(200L, 202L, 204L))
    } finally query.stop()
  }
}
