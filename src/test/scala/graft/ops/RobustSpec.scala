package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hampel flagging through the sketch: a planted spike is flagged, a
  * tight cluster is not, and the breakdown property holds (the
  * outlier does not drag its own threshold).
  */
class RobustSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("a gross outlier is flagged; the tight cluster is not") {
    // group a: 20 values near 100 plus one at 10000. Median ~100,
    // MAD small -> the spike is the single flagged row
    val rows = ((1 to 20).map(i => ("a", 95L + (i % 11))) :+ ("a", 10000L))
      .toDF("g", "v")
    val r = Robust.madOutlierCensus(rows, "g", "v").head()
    assert(r.getLong(3) == 21L)
    assert(r.getLong(4) == 1L, s"expected exactly the spike flagged: $r")
    // median estimate sits in the cluster, nowhere near the spike
    assert(r.getLong(1) >= 90L && r.getLong(1) <= 110L)
  }

  test("bimodal mass: the far mode flags, the median's own mode does not") {
    // 10 at 0, 11 at ~1000: rank 11 of 21 lands on the 1000-mode,
    // whose m=5 bucket has est_ub 1007; devs are ~1007 (far mode)
    // vs <= 7 (near mode) and MAD ~7 -> exactly the far mode flags.
    // A mean/stddev rule would put the center at ~524 with a huge
    // stddev and flag NOTHING — the breakdown contrast
    val rows = ((1 to 10).map(_ => ("b", 0L)) ++
      (1 to 10).map(_ => ("b", 1000L)) :+ ("b", 1010L)).toDF("g", "v")
    val r = Robust.madOutlierCensus(rows, "g", "v").head()
    assert(r.getLong(3) == 21L)
    assert(r.getLong(1) == 1007L && r.getLong(2) == 7L, r.toString)
    assert(r.getLong(4) == 10L)
  }

  test("groups are independent; constant groups flag nothing") {
    val rows = (Seq.fill(5)(("c", 7L)) ++ Seq.fill(5)(("d", 900L)))
      .toDF("g", "v")
    val got = Robust.madOutlierCensus(rows, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(got("c")._2 == 0L && got("d")._2 == 0L)
    assert(got("c")._1 == 7L)
  }
}
