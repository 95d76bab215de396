package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** KMV sketches: estimator accuracy, the exact union-merge property,
  * under-full exactness, and global/per-group path agreement.
  */
class SketchesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("estimate within 15% of a 10k-distinct planted corpus at k=256") {
    // 3 duplicate rows per value: the distinct must keep duplicates
    // from occupying sketch slots
    val df = spark.range(30000).select((col("id") % 10000).as("v"))
    val out = Sketches.kmvDistinct(df, "v", 256).collect().head
    assert(out.getLong(0) === 256L)
    val est = out.getDouble(2)
    assert(math.abs(est - 10000) / 10000.0 <= 0.15,
      s"estimate $est off by more than 15%")
  }

  test("sketch of a union equals the merge of the sketches, exactly") {
    val a = spark.range(4000).select(col("id").as("v"))
    val b = spark.range(2000, 7000).select(col("id").as("v"))
    val k = 128
    val direct = Sketches.kmvSketch(a.unionByName(b), "v", k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val merged = Sketches.kmvMergeSketches(
      Sketches.kmvSketch(a, "v", k), Sketches.kmvSketch(b, "v", k), k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(direct === merged)
  }

  test("under-full sketch reports the exact count, both paths") {
    val df = Seq(("x", 1L), ("x", 2L), ("x", 2L), ("y", 5L))
      .toDF("g", "v")
    val global = Sketches.kmvDistinct(df, "v", 256).collect().head
    assert(global.getLong(0) === 3L)
    assert(global.getDouble(2) === 3.0)
    val grouped = Sketches.kmvDistinctPerGroup(df, "g", "v", 256)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(grouped === Map("x" -> 2.0, "y" -> 1.0))
  }

  test("KMV drops NULL values on both paths — COUNT-DISTINCT semantics, no crash") {
    val df = Seq(
      (Some(1L), "a"), (Some(2L), "a"), (None, "a"),
      (None, "b"), (None, "b")) // group b: ALL null values
      .toDF("v", "g")
    val global = Sketches.kmvDistinct(df, "v", 256).collect().head
    // null must not occupy a sketch slot (Spark sorts NULLS FIRST,
    // the DuckDB oracle NULLS LAST — dropping it is the only
    // engine-stable semantics) and the exact count ignores it
    assert(global.getLong(0) === 2L)
    assert(global.getDouble(2) === 2.0)
    // an all-null group emits NO row (and, critically, does not crash
    // the last-element read on an empty TopK array)
    val grouped = Sketches.kmvDistinctPerGroup(df, "g", "v", 256)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(grouped === Map("a" -> 2.0))
  }

  test("CMS never undercounts, and unseen probes estimate 0") {
    val df = spark.range(3000).select((col("id") % 100).as("v"))
    val cells = Sketches.cmsCells(df, "v", 4, 64)
    val truth = df.groupBy(col("v")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Sketches.cmsEstimate(cells, df, "v", 4, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truth.keySet === est.keySet)
    assert(truth.forall { case (v, n) => est(v) >= n },
      "CMS undercounted a key")
    // probes the sketch never saw: every row's buckets may still
    // collide, but with w=64 and 100 keys at least the MIN row is 0
    // for a far-away probe often enough to spot a broken coalesce —
    // assert the exact semantics instead: estimate from EMPTY cells
    val empty = Sketches.cmsCells(df.filter(lit(false)), "v", 4, 64)
    val zero = Sketches.cmsEstimate(empty, df.limit(5), "v", 4, 64)
      .collect().map(_.getLong(1))
    assert(zero.forall(_ === 0L), "missing cells did not count as 0")
  }

  test("CMS excludes NULLs on both sides — no null cells, no null estimates") {
    // the latent undercount: a NULL counted into the sketch can never
    // equi-join back from a probe (null keys don't match), so an
    // unfiltered NULL would estimate 0 with a positive true count —
    // the one case that violates the no-undercount guarantee. Both
    // sides filter NULLs (kmvHashes' COUNT-DISTINCT semantics).
    val withNulls = spark.range(100)
      .select(when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 7)
        .as("v"))
    val cells = Sketches.cmsCells(withNulls, "v", 4, 64)
    assert(cells.filter(col("bucket").isNull).isEmpty,
      "NULL values leaked into the sketch cells")
    val est = Sketches.cmsEstimate(cells, withNulls, "v", 4, 64)
    assert(est.filter(col("v").isNull).isEmpty,
      "NULL probe produced an estimate row")
    // non-null keys still never undercount
    val truth = withNulls.filter(col("v").isNotNull)
      .groupBy(col("v")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = est.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truth.keySet === got.keySet)
    assert(truth.forall { case (v, n) => got(v) >= n })
  }

  test("CMS cells of a union equal the merged cells, exactly") {
    val a = spark.range(2000).select((col("id") % 50).as("v"))
    val b = spark.range(1000).select((col("id") % 80).as("v"))
    def cellMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = cellMap(Sketches.cmsCells(a.unionByName(b), "v", 4, 64))
    val merged = cellMap(Sketches.cmsMerge(
      Sketches.cmsCells(a, "v", 4, 64), Sketches.cmsCells(b, "v", 4, 64)))
    assert(direct === merged)
  }

  test("per-group TopK path agrees with the global path on a single group") {
    val df = spark.range(5000)
      .select(lit("only").as("g"), (col("id") % 1777).as("v"))
    val k = 64
    val global = Sketches.kmvDistinct(df, "v", k).collect().head.getDouble(2)
    val grouped = Sketches.kmvDistinctPerGroup(df, "g", "v", k)
      .collect().head.getDouble(2)
    assert(global === grouped)
  }

  test("KmvSketch aggregator at a large-k dial (4096) equals the sorted-distinct reference, duplicates invisible") {
    import graft.functions.KmvSketch
    val k = 4096
    // 6000 distinct hashes (> k: the displace path), each twice (the
    // duplicate-blind slot rule), shuffled across 7 partitions so
    // merge() runs over genuinely split buffers
    val vals = new scala.util.Random(23)
      .shuffle((0 until 6000).map(i => i.toLong * 2654435761L))
    val df = (vals ++ vals).toDF("h").repartition(7)
    val got = df.agg(KmvSketch.kmv_sketch(col("h"), k).as("sk"))
      .collect().head.getSeq[Long](0)
    val want = vals.distinct.sorted.take(k)
    assert(got.length === k)
    assert(got.toList === want.toList,
      "array-backed buffer diverged from the sorted-distinct reference")
    // underfull stays exact and ascending at the same dial
    val few = Seq(5L, 1L, 5L, 3L).toDF("h")
    val fk = few.agg(KmvSketch.kmv_sketch(col("h"), k)).collect()
      .head.getSeq[Long](0)
    assert(fk.toList === List(1L, 3L, 5L))
  }

  test("kmvOverlap estimates a planted 50% Jaccard within 20%") {
    // |A|=6000, |B|=6000, |A∩B|=4000, |A∪B|=8000 → J = 0.5
    val a = spark.range(6000).select(col("id").as("v"))
    val b = spark.range(2000, 8000).select(col("id").as("v"))
    val out = Sketches.kmvOverlap(a, b, "v", 256).collect().head
    val j = out.getDouble(2)
    val inter = out.getDouble(4)
    assert(math.abs(j - 0.5) <= 0.10, s"jaccard $j")
    assert(math.abs(inter - 4000) / 4000.0 <= 0.20, s"intersection $inter")
  }

  test("kmvOverlap under-full union is exact; disjoint sets estimate 0") {
    val a = spark.range(50).select(col("id").as("v"))
    val b = spark.range(30, 80).select(col("id").as("v"))
    val out = Sketches.kmvOverlap(a, b, "v", 256).collect().head
    // union of 80 < k: exact counts, jaccard_est NULL (not estimated)
    assert(out.getLong(1) == 80L)
    assert(out.isNullAt(2))
    assert(out.getDouble(3) == 80.0)
    assert(out.getDouble(4) == 20.0) // exact |A ∩ B| = |{30..49}|
    val disj = Sketches.kmvOverlap(
      spark.range(5000).select(col("id").as("v")),
      spark.range(5000, 10000).select(col("id").as("v")), "v", 256)
      .collect().head
    assert(disj.getLong(0) == 0L && disj.getDouble(4) == 0.0)
  }
}
