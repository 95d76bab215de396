package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Scale twins for the exact-`percentile` gates (t_mad,
  * t_length_quartiles, t_winsorize): the gated queries use exact
  * `percentile` because the oracle demands value-exactness and the
  * dyadic fractions interpolate exactly — but exact percentile
  * buffers every group value (OpenHashMap per group) and does not
  * scale to billion-row groups. The 100 TB swap-in is
  * `approx_percentile` (Greenwald–Khanna summaries: bounded state,
  * mergeable map-side). This spec pins the swap's fidelity on the
  * real testdata: at the default accuracy, every approx answer for
  * the seven gated fractions must land within the rank-error
  * contract of the exact answer, per language group.
  */
class PercentileScaleSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // the seven gated fractions across t_mad / t_length_quartiles /
  // t_winsorize
  private val fractions = Seq(0.125, 0.25, 0.5, 0.75, 0.875)

  test("approx_percentile twins track the exact gated percentiles per group") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("n_chars"))
    val aggs = fractions.zipWithIndex.map { case (f, i) =>
      expr(s"approx_percentile(n_chars, ${f}D, 10000)").as(s"ap_$i")
    } :+ sort_array(collect_list(col("n_chars"))).as("vals")
    val rows = docs.groupBy(col("lang")).agg(aggs.head, aggs.tail: _*)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- fractions.indices) {
      val approx = r.getAs[Number](s"ap_$i").doubleValue()
      val vals = r.getSeq[Number](r.fieldIndex("vals")).map(_.doubleValue())
      // the GK contract is a RANK guarantee (error <= 1/accuracy, i.e.
      // < 1 rank at these group sizes), NOT a value guarantee: the
      // exact `percentile` interpolates BETWEEN order statistics while
      // approx returns one, and adjacent order stats in a sparse tail
      // can be far apart in value. Assert the contract itself: the
      // approx answer must BE an order statistic within one rank of
      // the target position.
      val target = fractions(i) * (vals.size - 1)
      val admissible = (math.floor(target).toInt - 1 to
        math.ceil(target).toInt + 1)
        .filter(j => j >= 0 && j < vals.size).map(vals(_)).toSet
      assert(admissible.contains(approx),
        s"lang=${r.get(0)} p=${fractions(i)}: approx $approx not an " +
          s"order stat within one rank of $target (admissible $admissible)")
    }
  }

  test("approx MAD twin tracks the exact two-pass t_mad statistic") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("n_chars"))
    val med = docs.groupBy(col("lang"))
      .agg(expr("percentile(n_chars, 0.5D)").as("med"),
        expr("approx_percentile(n_chars, 0.5D, 10000)").as("amed"))
    val joined = docs.join(med, Seq("lang"))
    val mads = joined.groupBy(col("lang"))
      .agg(expr("percentile(abs(cast(n_chars as double) - med), 0.5D)")
          .as("mad"),
        expr("approx_percentile(abs(cast(n_chars as double) - amed), 0.5D, 10000)")
          .as("amad"))
      .collect()
    assert(mads.nonEmpty)
    for (r <- mads) {
      val exact = r.getAs[Double]("mad")
      val approx = r.getAs[Number]("amad").doubleValue()
      assert(math.abs(approx - exact) <= math.max(1.0, exact * 0.02),
        s"lang=${r.get(0)}: approx MAD $approx vs exact $exact")
    }
  }
}
