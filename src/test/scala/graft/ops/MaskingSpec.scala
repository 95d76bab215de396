package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Span-corruption planning: determinism, rate, island merging, and
  * shard independence.
  */
class MaskingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def doc(n: Int) = (1L, (1 to n).map(i => s"w$i").mkString(" "))

  test("spans are disjoint, ordered, in-range, and merge adjacent picks") {
    val df = Seq(doc(400)).toDF("doc_id", "text")
    val spans = Masking.spanPlan(df, "doc_id", "text")
      .orderBy("span_idx").collect()
    var lastEnd = 0
    spans.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(1) == i + 1)
      val start = r.getInt(2); val len = r.getInt(3)
      assert(len >= 1 && start > lastEnd + 1 - 1)
      // spans separated by at least one unmasked token (else merged)
      assert(start > lastEnd + 1 || lastEnd == 0)
      lastEnd = start + len - 1
      assert(lastEnd <= 400)
    }
    // ~15% of 400 positions masked in total
    val masked = spans.map(_.getInt(3)).sum
    assert(masked > 20 && masked < 120, s"masked $masked of 400")
  }

  test("plan is deterministic and partition-count independent") {
    val one = Seq(doc(300)).toDF("doc_id", "text").repartition(1)
    val many = Seq(doc(300)).toDF("doc_id", "text").repartition(7)
    val a = Masking.spanPlan(one, "doc_id", "text").collect().toSet
    val b = Masking.spanPlan(many, "doc_id", "text").collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("different salts produce different plans; empty docs emit nothing") {
    val df = Seq(doc(200), (2L, "")).toDF("doc_id", "text")
    val a = Masking.spanPlan(df, "doc_id", "text", salt = 1L).collect().toSet
    val b = Masking.spanPlan(df, "doc_id", "text", salt = 2L).collect().toSet
    assert(a != b)
    assert(!a.exists(_.getLong(0) == 2L))
  }
}
