package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Binary sign quantization: bit layout pinned against hand-computed
  * words, Hamming metric axioms on the packed corpus, and the
  * packing plan's map-only shape.
  */
class BinarySpec extends AnyFunSuite with SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("signPack bit layout: word w bit i = component w*32+i+1 > 0") {
    import spark.implicits._
    // component 1 (bit 0 of w0) positive, component 32 (bit 31 of w0)
    // positive, component 33 (bit 0 of w1) positive, component 64
    // (bit 31 of w1) zero — zeros and negatives must NOT set bits
    val v = Array.fill(64)(-1.0)
    v(0) = 0.5; v(31) = 2.0; v(32) = 1e-9; v(63) = 0.0
    val df = Seq((1L, v.map(_.toFloat).toSeq)).toDF("vec_id", "embedding")
    val row = Binary.signPack(df, "vec_id", "embedding").head()
    assert(row.getLong(1) == ((1L << 0) | (1L << 31)))
    assert(row.getLong(2) == (1L << 0))
    // all-zero vector packs to all-zero words (no NaN/sign hazard)
    val z = Seq((2L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val zr = Binary.signPack(z, "vec_id", "embedding").head()
    assert(zr.getLong(1) == 0L && zr.getLong(2) == 0L)
  }

  test("hammingTopK: exact distances, symmetry, tie-break by id") {
    import spark.implicits._
    val base = Array.fill(64)(1.0)
    val flip3 = base.clone(); flip3(5) = -1; flip3(40) = -1; flip3(63) = -1
    val flip1 = base.clone(); flip1(10) = -1
    val df = Seq(
      (1L, base.map(_.toFloat).toSeq),
      (2L, flip1.map(_.toFloat).toSeq),
      (3L, flip3.map(_.toFloat).toSeq),
      (4L, base.map(_.toFloat).toSeq), // exact duplicate of 1
    ).toDF("vec_id", "embedding")
    val out = Binary.hammingTopK(df.filter($"vec_id" === 1), df,
      "vec_id", "embedding", k = 3).collect()
    // duplicate first at distance 0, then 1 flip, then 3 flips
    assert(out.map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toSeq ==
      Seq((4L, 1, 0L), (2L, 2, 1L), (3L, 3, 3L)))
  }

  test("hamming ties break by ascending neighbor id") {
    import spark.implicits._
    val base = Array.fill(64)(1.0)
    val a = base.clone(); a(7) = -1
    val b = base.clone(); b(55) = -1 // same distance 1, different bit
    val df = Seq(
      (10L, base.map(_.toFloat).toSeq),
      (30L, b.map(_.toFloat).toSeq),
      (20L, a.map(_.toFloat).toSeq),
    ).toDF("vec_id", "embedding")
    val out = Binary.hammingTopK(df.filter($"vec_id" === 10), df,
      "vec_id", "embedding", k = 2).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(20L, 30L))
  }

  test("packing agrees with an independent per-component reconstruction") {
    // corpus-scale cross-check: unpack each word back to bits and
    // compare against the sign of the original component
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val packed = Binary.signPack(emb, "vec_id", "embedding")
    val joined = emb.select(col("vec_id").as("id"), col("embedding"))
      .join(packed, "id")
    val bad = joined.filter(
      (0 until 64).map { d =>
        val bit = shiftrightunsigned(col(s"w${d / 32}"), d % 32) % 2
        val want = when(element_at(col("embedding"), d + 1) > 0, 1L).otherwise(0L)
        bit =!= want
      }.reduce(_ || _)).count()
    assert(bad == 0L)
  }

  test("signPack plan is map-only (no exchange)") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val plan = Binary.signPack(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"packing must not shuffle:\n$plan")
  }
}
