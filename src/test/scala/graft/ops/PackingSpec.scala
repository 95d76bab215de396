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

  test("materializeSequences reconstructs every document once, in id order") {
    val rows = (1L to 40L).map(i => i -> words(3 + (i % 5).toInt))
    def run(parts: Int) = Packing.materializeSequences(
      docs(rows: _*).repartition(parts), "doc_id", "text",
      maxTokens = 16, shards = 3, sep = "#")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getString(5),
          r.getLong(6))))
      .toMap
    val out = run(2)
    assert(out === run(11), "materialization depends on partition layout")
    // per-row accounting
    for (((_, _), (nDocs, nClipped, seqTok, text, chars)) <- out) {
      assert(text.split("#", -1).length === nDocs)
      assert(chars === text.length.toLong)
      assert(nClipped >= 0 && nClipped <= nDocs)
      assert(seqTok > 0)
    }
    // global reconstruction: concatenating sequences per shard in seq
    // order and splitting on the separator yields every document
    // exactly once, in (shard-assignment, id) order
    val assign = Packing.packSequences(docs(rows: _*), "doc_id", "text",
        maxTokens = 16, shards = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byShard = assign.groupBy(_._2).view
      .mapValues(_.map(_._1).sorted.map(id => rows.toMap.apply(id))).toMap
    val rebuilt = out.toSeq.sortBy { case ((sh, sq), _) => (sh, sq) }
      .groupBy(_._1._1).view
      .mapValues(_.flatMap(_._2._4.split("#", -1))).toMap
    assert(rebuilt.view.mapValues(_.toSeq).toMap ===
      byShard.view.mapValues(_.toSeq).toMap)
    // sequence budget: every sequence's token sum is bounded by the
    // capacity plus its one boundary straddler
    val tokensOf = rows.toMap.view.mapValues(_.split(" ").length.toLong).toMap
    val maxDoc = tokensOf.values.max
    assert(out.values.forall(_._3 <= 16 + maxDoc))
  }

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
