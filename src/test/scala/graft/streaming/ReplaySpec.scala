package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Replay-harness hygiene + the foreachBatch replay path: one replay
  * invocation must leave exactly ONE live dir (the sink) in its temp
  * root — staging dirs, the input dir, and the checkpoint are reaped
  * eagerly (the root itself reaps at JVM exit, since the returned
  * frame reads the sink lazily).
  */
class ReplaySpec extends AnyFunSuite with SparkSpec {

  test("a replay leaves exactly the sink dir in its temp root") {
    import spark.implicits._
    val ev = Seq(
      Streams.EventRow(1L, new Timestamp(1000000L), 1L, "a", 1.0, ""),
      Streams.EventRow(2L, new Timestamp(2000000L), 1L, "b", 2.0, ""),
      Streams.EventRow(3L, new Timestamp(7200000L), 2L, "a", 3.0, "")).toDF()

    val out = Replay.ewmaReplay(spark, ev, alpha = 0.5)
    val rows = out.orderBy("user_id").collect()

    // the two-batch split (mid-ts cut at 4100000 ms) puts user 1's two
    // events in batch 1 and user 2's in batch 2; the final fold must
    // equal the batch EWMA regardless
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .toSeq === Seq((1L, 2L, 1.5), (2L, 1L, 3.0)))

    val sinkFile = new java.io.File(new java.net.URI(out.inputFiles.head))
    val root = sinkFile.getParentFile.getParentFile
    assert(root.getName.startsWith("graft_replay_"), root.toString)
    val live = root.listFiles().map(_.getName).filterNot(_ == "out")
    assert(live.isEmpty,
      s"replay left non-sink entries in ${root}: ${live.mkString(", ")}")
  }

  test("the generic-schema replay honors the same cleanup invariant") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "y")).toDF("id", "v")
    val out = Replay.replayBatches(spark,
      Seq(a.filter(col("id") < 3), a.filter(col("id") >= 3)),
      src => src.filter(col("v") === "y").select(col("id")))
    assert(out.as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    val root = new java.io.File(new java.net.URI(out.inputFiles.head))
      .getParentFile.getParentFile
    val live = root.listFiles().map(_.getName).filterNot(_ == "out")
    assert(live.isEmpty,
      s"replayBatches left non-sink entries in ${root}: ${live.mkString(", ")}")
  }

  test("complete-mode replay folds mergeable state across batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq(("a", 10L), ("a", 30L), ("b", 5L), ("a", 20L), ("b", 7L))
      .toDF("k", "cents")
    val out = Replay.replayBatchesComplete(spark,
      Seq(rows.limit(3), rows.exceptAll(rows.limit(3))),
      df => graft.ops.IncrementalAgg.stats(df, Seq("k"), col("cents")))
    // the final snapshot equals the batch aggregate over ALL rows,
    // whichever batch each row landed in
    val got = out.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a")._1 == 3L && got("a")._2 == 60L)
    assert(got("b") == (2L, 12L, 5L, 7L))
    val root = new java.io.File(new java.net.URI(out.inputFiles.head))
      .getParentFile.getParentFile
    val live = root.listFiles().map(_.getName).filterNot(_ == "out")
    assert(live.isEmpty,
      s"replayBatchesComplete left non-sink entries: ${live.mkString(", ")}")
  }
}
