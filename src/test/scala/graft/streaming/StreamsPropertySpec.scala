package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.streaming.Streams.EventRow

/** Batch-vs-stream equivalence for the streaming twins under
  * ScalaCheck-RANDOM micro-batch splits (seeded Gen chain, same
  * offline pattern as FrameOpsPropertySpec) — the fixed splits in
  * StreamsSpec prove one delivery schedule; these properties assert
  * the invariant the twins actually claim: the final answer does not
  * depend on HOW the stream was chopped into micro-batches or the
  * order within them. Event times all sit inside one watermark
  * window, so no generated schedule can legitimately drop state.
  */
class StreamsPropertySpec extends AnyFunSuite with SparkSpec {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  /** 30 events over 12 distinct event_ids (guaranteed duplicates),
    * 7 users, text payload with planted blocklist hits.
    */
  private val corpus: Seq[EventRow] = (1 to 30).map { i =>
    EventRow(i % 12, ts(i % 20), i % 7, "doc", 1.0,
      if (i % 5 == 0) "benchmark question" else s"ordinary text $i")
  }

  /** A random delivery schedule: permuted corpus chopped into 1..5
    * micro-batches (empty batches allowed and dropped).
    */
  private val scheduleGen: Gen[Seq[Seq[EventRow]]] = for {
    nBatches <- Gen.choose(1, 5)
    prio <- Gen.listOfN(corpus.size, Gen.choose(0, Int.MaxValue))
    assign <- Gen.listOfN(corpus.size, Gen.choose(0, nBatches - 1))
  } yield {
    val permuted = corpus.zip(prio).sortBy(_._2).map(_._1)
    permuted.zip(assign).groupBy(_._2).toSeq.sortBy(_._1)
      .map(_._2.map(_._1)).filter(_.nonEmpty)
  }

  private def iterate[A](gen: Gen[A], n: Int)(body: (A, Int) => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(13L)
    (1 to n).foreach { i =>
      body(gen.pureApply(params, seed), i)
      seed = seed.next
    }
  }

  private def runSchedule(
      schedule: Seq[Seq[EventRow]], sinkName: String,
  )(mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
    outputMode: String): Unit = {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val query = mk(input.toDF())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(outputMode).start()
    try {
      schedule.foreach { batch =>
        input.addData(batch: _*)
        query.processAllAvailable()
      }
    } finally query.stop()
  }

  test("cmsCellsStream: final cells equal the batch sketch under any split") {
    import spark.implicits._
    val expected = graft.ops.Sketches.cmsCells(corpus.toDF(), "user_id", 4, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    iterate(scheduleGen, 5) { (schedule, i) =>
      val sink = s"cms_prop_$i"
      runSchedule(schedule, sink)(
        df => Streams.cmsCellsStream(df, "user_id", 4, 32), "complete")
      val got = spark.table(sink).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expected, s"schedule $i (${schedule.map(_.size)}) diverged")
    }
  }

  test("streamingDedup: surviving id set equals batch distinct under any split") {
    import spark.implicits._
    val expected = corpus.map(_.event_id).distinct.sorted
    iterate(scheduleGen, 5) { (schedule, i) =>
      val sink = s"dedup_prop_$i"
      runSchedule(schedule, sink)(
        df => Streams.streamingDedup(df, "event_id", "1 hour"), "append")
      val got = spark.table(sink).collect()
        .map(_.getAs[Long]("event_id")).sorted.toSeq
      assert(got === expected, s"schedule $i (${schedule.map(_.size)}) diverged")
    }
  }

  test("decontaminateStream: kept set equals the batch filter under any split") {
    import spark.implicits._
    val blocklist = Seq("benchmark question").toDF("text")
      .select(graft.text.TextFunctions.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("fp"))
    // batch truth: every (event_id, ts) pair whose text is not blocked
    val expected = corpus.filter(_.props != "benchmark question")
      .map(e => (e.event_id, e.ts.getTime)).sorted
    iterate(scheduleGen, 5) { (schedule, i) =>
      val sink = s"decontam_prop_$i"
      runSchedule(schedule, sink)(
        df => Streams.decontaminateStream(df, "props", blocklist), "append")
      val got = spark.table(sink).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Timestamp]("ts").getTime))
        .sorted.toSeq
      assert(got === expected, s"schedule $i (${schedule.map(_.size)}) diverged")
    }
  }
}
