package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Zone maps + the layout-skipping contrast: envelope math on a hand
  * frame, and the clustered-beats-random inequality on a spread of
  * values.
  */
class ZoneSkipSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("zoneMaps computes per-zone envelopes and row counts") {
    val rows = Seq((0, 10L), (0, 20L), (1, 5L), (1, 5L), (2, 99L))
      .toDF("zone", "v")
    val got = Sources.zoneMaps(rows).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(0 -> (10L, 20L, 2L), 1 -> (5L, 5L, 2L),
      2 -> (99L, 99L, 1L)))
  }

  test("clustered layout skips a selective range; random skips ~nothing") {
    // 4000 ids with v = id (uniform spread), 16 zones, predicate
    // covering 1/16 of the domain: clustered zones are disjoint
    // 250-wide value slabs so >= 14 of 16 skip; the random layout's
    // zones each span nearly the full domain so none skip
    val df = spark.range(4000).select(col("id"), col("id").as("v"))
    val got = Sources.layoutSkipContrast(
      df, "id", "v", nZones = 16, lo = lit(1000L), hi = lit(1249L))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (czones, cskip, crows, ctot) = got("clustered")
    val (_, rskip, rrows, rtot) = got("random")
    assert(czones == 16L && ctot == 4000L && rtot == 4000L)
    assert(cskip >= 14L && crows >= 3500L)
    assert(rskip == 0L && rrows == 0L)
  }

  test("a zone straddling the range boundary is scanned, not skipped") {
    // one zone [0,9], predicate [5,7]: envelope overlaps -> scan
    val df = spark.range(10).select(col("id"), col("id").as("v"))
    val got = Sources.layoutSkipContrast(
      df, "id", "v", nZones = 1, lo = lit(5L), hi = lit(7L))
      .filter(col("layout") === "clustered").head()
    assert(got.getLong(2) == 0L && got.getLong(3) == 0L)
  }
}
