package graft.text

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ChunkingSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("overlapping windows cover the document with the stride rule") {
    val out = Chunking.slidingWindows(
        docs((1L, "a b c d e f g")), "doc_id", "text",
        chunkTokens = 4, stride = 3)
      .orderBy("chunk_id")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (0, 0, 4, "a b c d"),
      (1, 3, 4, "d e f g"),
      (2, 6, 1, "g")))
  }

  test("empty and whitespace-only documents produce no windows") {
    val out = Chunking.slidingWindows(
      docs((1L, ""), (2L, "   \t  "), (3L, "x")),
      "doc_id", "text", chunkTokens = 8, stride = 8)
    assert(out.collect().map(r => (r.getLong(0), r.getString(4))).toSeq
      === Seq((3L, "x")))
  }

  test("stride wider than the chunk samples gapped windows") {
    val out = Chunking.slidingWindows(
        docs((1L, "a b c d e f g h i")), "doc_id", "text",
        chunkTokens = 2, stride = 4)
      .orderBy("chunk_id").collect()
      .map(r => (r.getInt(2), r.getString(4)))
    assert(out.toSeq === Seq((0, "a b"), (4, "e f"), (8, "i")))
  }

  test("whitespace runs canonicalize to single spaces in chunk_text") {
    val out = Chunking.slidingWindows(
      docs((1L, "  a\t\tb \n c  ")), "doc_id", "text",
      chunkTokens = 10, stride = 10).collect()
    assert(out.map(_.getString(4)).toSeq === Seq("a b c"))
  }

  test("the plan is map-only: no exchange") {
    val plan = Chunking.slidingWindows(
      docs((1L, "a b c")), "doc_id", "text", 4, 2)
      .queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty,
      s"expected a map-only plan, got:\n$plan")
  }

  test("windowsOf (SQL front-door form) agrees with slidingWindows") {
    val d = docs(
      (1L, (1 to 23).map(i => s"tk$i").mkString(" ")),
      (2L, "one two"),
      (3L, ""),
      (4L, "   "))
    for ((chunk, stride) <- Seq((4, 3), (8, 8), (2, 5))) {
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))
      val viaOp = Chunking.slidingWindows(d, "doc_id", "text", chunk, stride)
        .collect().map(key).sorted.toSeq
      val viaScalar = d.select(col("doc_id"),
          explode(Chunking.windowsOf(col("text"), chunk, stride)).as("w"))
        .select(col("doc_id"), col("w.chunk_id"), col("w.start_tok"),
          col("w.n_tokens"), col("w.chunk_text"))
        .collect().map(key).sorted.toSeq
      assert(viaScalar === viaOp, s"chunk=$chunk stride=$stride")
    }
  }

  test("chunk ids are dense and starts are stride multiples") {
    val text = (1 to 137).map(i => s"t$i").mkString(" ")
    val rows = Chunking.slidingWindows(
        docs((9L, text)), "doc_id", "text", chunkTokens = 16, stride = 10)
      .orderBy("chunk_id").collect()
    assert(rows.length === 14) // ceil(137 / 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(1) === i)
      assert(r.getInt(2) === i * 10)
      assert(r.getInt(3) === math.min(16, 137 - i * 10))
    }
  }
}
