package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer carrier (Catalyst derives the encoder from the Product);
  * `items` stays SORTED ascending.
  */
final case class KmvSketchBuffer(items: Array[Long])

/** Bounded per-group KMV (bottom-k) sketch: a typed Aggregator that
  * keeps the `k` smallest DISTINCT hash values per group, ascending.
  *
  * This is the aggregation-state form of [[graft.ops.Sketches]]'
  * bottom-k sketch — the piece the batch path gets for free from
  * `distinct() + TakeOrdered` but a STREAMING aggregation cannot
  * (a pre-aggregation distinct would itself be unbounded per-key
  * state). Deduplication happens inside the O(k) buffer: a hash
  * already present never re-occupies a slot, so duplicate arrivals
  * are invisible to the sketch — exactly the duplicate-blind,
  * order-blind, exactly-mergeable semantics bottom-k needs (the
  * sketch of a union is the k smallest of the union of sketches).
  * That makes it legal streaming state: per-key state is ≤ k longs
  * no matter how many rows arrive, where an exact per-fingerprint
  * census grows with the corpus ([[graft.ops.CorpusCard]]'s
  * 100 TB concern, the r18 verdict's one weak).
  *
  * Nulls are skipped like the builtin aggregates (and like
  * [[graft.ops.Sketches.kmvHashes]]' COUNT-DISTINCT stance); the
  * input is Option-ized so a nullable hash column deserializes
  * instead of throwing (the [[TopK]] lesson).
  *
  * The buffer is a sorted Array[Long]: membership/position via
  * binary search (O(log k) — the dedup check and the insertion
  * point in one probe), insertion via two arraycopy memmoves — the
  * large-k shape (k ≫ 1024) the r19 sorted-list buffer deferred;
  * same contract, same ArrayType(LongType) encoder shape, and a
  * duplicate or an above-max arrival on a full sketch allocates
  * NOTHING (the common case once the sketch saturates).
  */
final case class KmvSketch(k: Int)
    extends Aggregator[Option[Long], KmvSketchBuffer, Seq[Long]] {

  require(k > 1, s"k $k must be > 1 (the estimator divides by k-1)")

  override def zero: KmvSketchBuffer = KmvSketchBuffer(Array.emptyLongArray)

  private def add(items: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(items, h)
    if (idx >= 0) items // distinct: already a slot
    else {
      val ins = -idx - 1
      if (items.length < k) {
        val out = new Array[Long](items.length + 1)
        System.arraycopy(items, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(items, ins, out, ins + 1, items.length - ins)
        out
      } else if (ins < k) { // h below the current max: displace it
        val out = new Array[Long](k)
        System.arraycopy(items, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(items, ins, out, ins + 1, k - ins - 1)
        out
      } else items
    }
  }

  override def reduce(b: KmvSketchBuffer, in: Option[Long]): KmvSketchBuffer =
    in match {
      case Some(h) => KmvSketchBuffer(add(b.items, h))
      case None => b
    }

  /** Single-pass two-pointer merge of the two SORTED buffers, deduped
    * and truncated at k: O(k) time and ONE allocation — the
    * element-at-a-time fold re-allocated a k-length array per
    * inserted element, O(k²) bytes churned when merging two full
    * large-k sketches (every shuffle-side combine at the k=4096 dial).
    */
  override def merge(a: KmvSketchBuffer, b: KmvSketchBuffer): KmvSketchBuffer = {
    val xs = a.items; val ys = b.items
    if (ys.isEmpty) a
    else if (xs.isEmpty) b
    else {
      val out = new Array[Long](math.min(xs.length + ys.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < xs.length || j < ys.length)) {
        val takeX = j >= ys.length || (i < xs.length && xs(i) <= ys(j))
        val v = if (takeX) xs(i) else ys(j)
        if (takeX) { i += 1; if (j < ys.length && ys(j) == v) j += 1 }
        else j += 1 // ys(j) < xs(i): no cross-buffer dup possible
        out(n) = v; n += 1
      }
      KmvSketchBuffer(
        if (n == out.length) out else java.util.Arrays.copyOf(out, n))
    }
  }

  /** Ascending; the last element is the k-th smallest (the
    * estimator's `h_k`) when the sketch is full.
    */
  override def finish(b: KmvSketchBuffer): Seq[Long] = b.items.toSeq

  override def bufferEncoder: Encoder[KmvSketchBuffer] =
    Encoders.product[KmvSketchBuffer]
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object KmvSketch {

  /** Column form: `kmv_sketch(hash, k)` → ascending array of the k
    * smallest distinct hashes.
    */
  def kmv_sketch(hash: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(KmvSketch(k)).apply(hash)
  }
}
