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

  test("z-order zones skip on BOTH dims; lexicographic only on the leading key") {
    // full 64x64 grid (bits=6), 16 zones, a narrow predicate on each
    // dim: lex layout (binned on x) skips x-predicates but never
    // y-predicates (every x-slab spans all of y); Morton tiles are
    // narrow in both coordinates
    val dom = 64
    val grid = spark.range((dom * dom).toLong)
      .select((col("id") / dom).cast("long").as("x"),
        (col("id") % dom).cast("long").as("y"))
    val got = Sources.zorderSkipContrast(grid, "x", "y", bits = 6,
      nZones = 16, xLo = 10L, xHi = 13L, yLo = 20L, yHi = 23L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("lex", "x"))._2 >= 12L, s"lex-x skips: $got")
    assert(got(("lex", "y"))._2 == 0L, s"lex-y must not skip: $got")
    // 16 Morton zones on a 64x64 grid are 16x16 tiles: the 4-wide
    // predicate intersects exactly one tile row/column -> 12 skip
    assert(got(("zorder", "x"))._2 == 12L, s"zorder-x skips: $got")
    assert(got(("zorder", "y"))._2 == 12L, s"zorder-y skips: $got")
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
