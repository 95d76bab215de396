package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Sequence packing: running-total arithmetic, boundary flagging, and
  * partition-layout independence (the determinism 100 TB runs rely
  * on).
  */
class PackingSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("single shard: running totals, sequence boundaries, clipped flags") {
    // token counts 6, 6, 6 into capacity-10 sequences:
    //   doc 1: starts 0  -> seq 0, offset 0, 0+6 <= 10  -> not clipped
    //   doc 2: starts 6  -> seq 0, offset 6, 6+6 > 10   -> clipped
    //   doc 3: starts 12 -> seq 1, offset 2, 2+6 <= 10  -> not clipped
    val out = Packing.packSequences(
      docs(1L -> words(6), 2L -> words(6), 3L -> words(6)),
      "doc_id", "text", maxTokens = 10, shards = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(out(1L) == ((0L, 0L, false)))
    assert(out(2L) == ((0L, 6L, true)))
    assert(out(3L) == ((1L, 2L, false)))
  }

  test("per-shard accounting is exact and independent of partition layout") {
    val rows = (0 until 500).map(i => i.toLong -> words(1 + (i % 37)))
    def pack(parts: Int) = Packing.packSequences(
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, parts),
        StructType(Seq(StructField("doc_id", LongType, nullable = false),
          StructField("text", StringType, nullable = false)))),
      "doc_id", "text", maxTokens = 128, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val a = pack(3).sortBy(_._1)
    assert(a.toSeq == pack(19).sortBy(_._1).toSeq,
      "packing depends on partition layout")
    // recompute the running totals per shard in plain Scala and check
    // every derived column
    a.groupBy(_._2).foreach { case (_, shardRows) =>
      var running = 0L
      shardRows.sortBy(_._1).foreach {
        case (id, _, n, seq, off, clipped) =>
          assert(seq == running / 128,
            s"doc $id: seq $seq != ${running / 128}")
          assert(off == running % 128, s"doc $id: offset $off")
          assert(clipped == (running % 128 + n > 128), s"doc $id: clipped")
          assert(off >= 0 && off < 128)
          running += n
      }
    }
    // shards spread: every shard got a meaningful share of 500 docs
    val byShard = a.groupBy(_._2).view.mapValues(_.size)
    assert(byShard.size == 4 && byShard.values.forall(_ > 50), s"$byShard")
  }
}
