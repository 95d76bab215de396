package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer and output-row carriers (Catalyst derives encoders for
  * concrete Product types).
  */
final case class TopKBuffer(items: List[TopKRow])
final case class TopKRow(value: Double, id: Long)

/** Bounded-heap per-group top-k: a typed Aggregator that keeps only
  * the k largest `(value, id)` pairs per group — value descending,
  * id ASCENDING as the deterministic tie-break — and emits them best
  * first.
  *
  * Why not a window? `row_number() OVER (PARTITION BY g ORDER BY v)`
  * SORTS EVERY GROUP IN FULL before discarding all but k rows. This
  * aggregator's state never exceeds k pairs: partial aggregation
  * truncates map-side (each mapper ships at most k pairs per group),
  * the shuffle moves O(groups·k), and no full-group sort ever runs —
  * the vocabulary census' TakeOrderedAndProject reasoning, applied
  * per group. At 100 TB with heavy groups that is the difference
  * between a bounded aggregate and a spill-prone partition sort.
  *
  * The buffer is an ascending-sorted list (eviction candidate first)
  * capped at k; reduce and merge are O(k) per call.
  *
  * Nulls: a row whose value OR id is null is SKIPPED, matching the
  * builtin aggregates (`min`/`max_by` drop null inputs). The input
  * type is Option-ized for exactly this — a bare `(Double, Long)`
  * input encoder throws on the first null at deserialization, which
  * surfaces as an opaque runtime error on any nullable column.
  */
final case class TopK(k: Int)
    extends Aggregator[(Option[Double], Option[Long]), TopKBuffer, Seq[TopKRow]] {

  require(k > 0, s"k $k must be positive")

  // "a worse than b" = lower value, then HIGHER id (so ties keep the
  // smaller id); buffer is sorted worst-first
  private def worse(a: TopKRow, b: TopKRow): Boolean =
    a.value < b.value || (a.value == b.value && a.id > b.id)

  override def zero: TopKBuffer = TopKBuffer(Nil)

  override def reduce(b: TopKBuffer, in: (Option[Double], Option[Long])): TopKBuffer =
    in match {
      case (Some(v), Some(i)) => reduceRow(b, TopKRow(v, i))
      case _ => b // null value or id: skip, like min/max_by
    }

  private def reduceRow(b: TopKBuffer, row: TopKRow): TopKBuffer = {
    if (b.items.size < k) TopKBuffer(insert(b.items, row))
    else if (worse(b.items.head, row)) TopKBuffer(insert(b.items.tail, row))
    else b
  }

  private def insert(items: List[TopKRow], row: TopKRow): List[TopKRow] = {
    val (below, above) = items.span(x => worse(x, row))
    below ::: row :: above
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer =
    b.items.foldLeft(a)(reduceRow)

  /** Best first: value desc, id asc. */
  override def finish(b: TopKBuffer): Seq[TopKRow] = b.items.reverse

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[Seq[TopKRow]] =
    ExpressionEncoder[Seq[TopKRow]]()
}

object TopK {

  /** Column form: `top_k(value, id, k)` → array of `(value, id)`
    * structs, best first.
    */
  def top_k(value: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(TopK(k)).apply(value, id)
  }
}
