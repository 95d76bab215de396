package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketches — cardinality
  * estimation for corpus-scale profiling where `COUNT(DISTINCT)` is
  * the expensive thing being avoided. The sketch is the k smallest
  * md5-derived hashes of the distinct values; the estimator is
  * `(k-1) / h_k` with `h_k` the k-th smallest hash normalized to
  * (0,1). Bottom-k sketches merge exactly: the sketch of a union is
  * the k smallest of the union of sketches, so per-partition /
  * per-day sketches roll up without touching the raw data again —
  * the property that makes the structure useful at 100 TB
  * (see Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002).
  *
  * Unlike HyperLogLog (`approx_count_distinct`), whose register
  * layout and rounding are engine-private, every step here — md5,
  * 60-bit hex parse, long→double rounding, ONE division — is a fixed
  * deterministic op sequence both engines compute identically, so
  * sketches AND estimates sit under the DuckDB hash gate
  * (`s_kmv_distinct`, `s_kmv_groups`).
  *
  * 100 TB shapes: the global sketch is distinct → TakeOrdered (a
  * per-partition heap of k rows, no global sort); the per-group form
  * routes the negated hashes through the bounded-heap [[
  * graft.functions.TopK]] aggregate — O(k) state per group,
  * map-side-truncated, O(groups·k) shuffle, never a per-group sort.
  */
object Sketches {

  /** 2^60 — the normalizer for the 15-hex-digit (60-bit) hash. */
  private val HashSpan = 1152921504606846976.0

  /** 60-bit integer hash of a value's string rendering (the md5
    * pattern every gated sampler here uses). Stringification must be
    * engine-identical — integer and string keys are; gate doubles or
    * timestamps through an explicit canonical rendering first.
    */
  def kmvHash(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** Distinct values → `(hi: long, hn: double)` hash frame. Distinct
    * BEFORE hashing: duplicates must not occupy sketch slots, and the
    * distinct is on the (often pre-aggregated) value column only.
    * NULL values are dropped first — `COUNT(DISTINCT)` semantics, and
    * the null-safety anchor for every consumer: a null hash would
    * occupy a Spark sketch slot under ASC NULLS FIRST while the
    * DuckDB oracle's ORDER BY (NULLS LAST) would never keep it — the
    * same engine-divergent null ordering the cosine paths guard
    * against.
    */
  def kmvHashes(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).as("v")).filter(col("v").isNotNull).distinct()
      .select(kmvHash(col("v")).as("hi"))
      .select(col("hi"), (col("hi").cast("double") / HashSpan).as("hn"))

  /** The sketch: k smallest hashes, ascending — plans as TakeOrdered
    * (distributed heap), never a global sort.
    */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k > 1, s"k $k must be > 1 (the estimator divides by k-1)")
    kmvHashes(df, valueCol).orderBy(col("hi")).limit(k)
  }

  /** Exact union merge: the k smallest of the two sketches' union —
    * no raw data touched. Associative and commutative; equals the
    * sketch built from the unioned inputs (SketchesSpec pins it).
    */
  def kmvMergeSketches(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b).distinct().orderBy(col("hi")).limit(k)

  /** Estimate from a sketch: `(n_kept, kth_hash, n_distinct_est)`.
    * Under-full sketch (fewer than k distinct values) = the sketch IS
    * the value set, so the exact count is emitted instead of the
    * estimator.
    */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("n_kept"), max(col("hn")).as("kth_hash"))
      .select(col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit(k - 1.0) / col("kth_hash")).as("n_distinct_est"))

  /** Global distinct-count estimate in one call. */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int): DataFrame =
    kmvEstimate(kmvSketch(df, valueCol, k), k)

  /** Per-group estimates through the bounded-heap TopK aggregate:
    * value = NEGATED normalized hash (TopK keeps the k largest, so
    * the k largest negations are the k smallest hashes; best-first
    * output puts the k-th smallest LAST), id = the 60-bit hash (the
    * deterministic tie-break; ties are exact-duplicate hashes, which
    * the distinct already removed). NULL values are dropped like
    * [[kmvHashes]] does (COUNT-DISTINCT semantics); a group whose
    * values are ALL null therefore emits no row — it also guarantees
    * every emitted group has a non-empty array, so the
    * `element_at(arr, size(arr))` last-element read cannot hit the
    * invalid index 0. Output: `(groupCol, n_kept, n_distinct_est)`.
    */
  def kmvDistinctPerGroup(
      df: DataFrame, groupCol: String, valueCol: String, k: Int): DataFrame = {
    require(k > 1, s"k $k must be > 1 (the estimator divides by k-1)")
    val pairs = df.select(col(groupCol).as("g"), col(valueCol).as("v"))
      .filter(col("v").isNotNull)
      .distinct()
      .select(col("g"), kmvHash(col("v")).as("hi"))
      .select(col("g"), col("hi"),
        (col("hi").cast("double") / HashSpan).as("hn"))
    pairs.groupBy(col("g"))
      .agg(graft.functions.TopK.top_k(-col("hn"), col("hi"), k).as("arr"))
      .select(col("g").as(groupCol), size(col("arr")).as("n_kept"),
        (-element_at(col("arr"), size(col("arr"))).getField("value"))
          .as("kth_hash"))
      .select(col(groupCol), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit(k - 1.0) / col("kth_hash")).as("n_distinct_est"))
  }

  /** Estimate column over a [[graft.functions.KmvSketch]] array (the
    * k smallest distinct hashes, ascending): the [[kmvEstimate]]
    * arithmetic — exact count when underfull, `(k-1)/h_k` otherwise,
    * with `h_k` the LAST element normalized to (0,1). One cast, one
    * (or two) IEEE divisions — engine-identical, so sketched cards
    * sit under the same hash gates as the batch KMV rows.
    */
  def kmvSketchEstimate(sketch: Column, k: Int): Column = {
    require(k > 1, s"k $k must be > 1 (the estimator divides by k-1)")
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit(k - 1.0) /
        (element_at(sketch, size(sketch)).cast("double") / lit(HashSpan)))
  }

  /** DuckDB rendering of [[kmvSketchEstimate]] over a per-group
    * `(n_kept, kth_hi)` pair (sketch size and its largest hash).
    */
  def kmvSketchEstimateSql(nKept: String, kthHi: String, k: Int): String =
    s"CASE WHEN $nKept < $k THEN CAST($nKept AS DOUBLE) " +
      s"ELSE ${k - 1}.0 / (CAST($kthHi AS DOUBLE) / $HashSpan) END"

  /** Distinct-overlap estimate between two corpora from their KMV
    * sketches — the set-operation KMV was built for (union is
    * [[kmvMergeSketches]]; intersection follows from the ρ statistic):
    * with `K` = the k-th smallest hash of the UNION sketch, every
    * sketch hash ≤ K is a uniform sample of the union, so
    * `ρ = |{h ∈ skA ∩ skB : h ≤ K}|` binomially estimates Jaccard as
    * `ρ/k`, and `|A ∩ B| ≈ (ρ/k) · union_est`. Shard-level dedup
    * plans use exactly this to size cross-snapshot overlap BEFORE
    * running the expensive pairwise dedup (a near-zero estimate
    * skips the join entirely).
    *
    * Determinism: ρ, k and the underfull branch are integers; with
    * `k` a power of two `ρ/k` is one EXACT IEEE division, and the
    * final product is one IEEE multiply — engine-identical, hashed
    * raw. Underfull union (< k distinct values in A ∪ B) means the
    * sketches ARE the value sets: the exact intersection count is
    * emitted.
    *
    * Scale shape: two sketch builds (distinct + TakeOrdered heap,
    * the [[kmvSketch]] plan) and then k-row joins — the estimate
    * itself never touches corpus-sized data.
    *
    * Output (one row): `(rho, n_kept, jaccard_est, union_est,
    * inter_est)`.
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k > 1 && (k & (k - 1)) == 0,
      s"k $k must be a power of two > 1 (exact ρ/k division)")
    val ska = kmvSketch(a, valueCol, k)
    val skb = kmvSketch(b, valueCol, k)
    val merged = kmvMergeSketches(ska, skb, k)
    val stats = kmvEstimate(merged, k)
    val kth = merged.agg(max(col("hi")).as("kth_hi"))
    val common = ska.select(col("hi")).intersect(skb.select(col("hi")))
    val rho = common.crossJoin(broadcast(kth))
      .filter(col("hi") <= col("kth_hi"))
      .agg(count(lit(1)).as("rho"))
    rho.crossJoin(broadcast(stats))
      .select(col("rho"), col("n_kept"),
        when(col("n_kept") < k, lit(null).cast("double"))
          .otherwise(col("rho").cast("double") / k).as("jaccard_est"),
        col("n_distinct_est").as("union_est"),
        when(col("n_kept") < k, col("rho").cast("double"))
          .otherwise((col("rho").cast("double") / k) * col("n_distinct_est"))
          .as("inter_est"))
  }

  /** DuckDB rendering of [[kmvOverlap]] over two filtered reads of
    * `table.valueCol` (`whereA`/`whereB` are full `WHERE …` clauses
    * or "").
    */
  def kmvOverlapSql(
      table: String, valueCol: String, whereA: String, whereB: String,
      k: Int): String = {
    val (hi, _) = kmvHashSql("v")
    def sketch(where: String): String =
      s"""SELECT $hi AS hi FROM (SELECT DISTINCT $valueCol AS v FROM $table
         |    $where) dv
         |  WHERE v IS NOT NULL ORDER BY hi LIMIT $k""".stripMargin
    s"""WITH ska AS (${sketch(whereA)}),
       |skb AS (${sketch(whereB)}),
       |merged AS (SELECT DISTINCT hi FROM (SELECT hi FROM ska
       |    UNION ALL SELECT hi FROM skb) u ORDER BY hi LIMIT $k),
       |st AS (SELECT COUNT(*) AS n_kept, MAX(hi) AS kth_hi,
       |    MAX(CAST(hi AS DOUBLE) / $HashSpan) AS kth_hash FROM merged),
       |common AS (SELECT hi FROM ska INTERSECT SELECT hi FROM skb),
       |r AS (SELECT COUNT(*) AS rho FROM common, st WHERE hi <= st.kth_hi)
       |SELECT r.rho AS rho, CAST(st.n_kept AS BIGINT) AS n_kept,
       |  CASE WHEN st.n_kept < $k THEN NULL
       |       ELSE CAST(r.rho AS DOUBLE) / $k END AS jaccard_est,
       |  CASE WHEN st.n_kept < $k THEN CAST(st.n_kept AS DOUBLE)
       |       ELSE ${k - 1}.0 / st.kth_hash END AS union_est,
       |  CASE WHEN st.n_kept < $k THEN CAST(r.rho AS DOUBLE)
       |       ELSE (CAST(r.rho AS DOUBLE) / $k) * (${k - 1}.0 / st.kth_hash)
       |       END AS inter_est
       |FROM r, st""".stripMargin
  }

  // ---- Count-min sketch ----------------------------------------------

  /** Row-r bucket of value `v` in a width-`width` count-min sketch:
    * the same 60-bit md5 hash family, salted by the row index. All
    * integer arithmetic — engine-exact.
    */
  def cmsBucket(r: Column, v: Column, width: Int): Column =
    kmvHash(concat(r.cast("string"), lit(":"), v.cast("string"))) % width

  /** Count-min sketch cells of a column: `depth` salted hash rows ×
    * `width` buckets, each cell an exact count — `(r, bucket, n)`,
    * absent cells ≡ 0 (Cormode & Muthukrishnan, J. Algorithms 2005).
    * Map-only explode (depth rows per input) + ONE map-side-combined
    * aggregate; the sketch is `depth·width` rows no matter the corpus
    * size, so it always broadcasts downstream and merges element-wise
    * ([[cmsMerge]] — exact, integer addition).
    *
    * NULL values are EXCLUDED from the sketch, matching [[kmvHashes]]
    * (COUNT-DISTINCT-style null semantics): a NULL hashes to a NULL
    * bucket, and null keys never equi-join back in [[cmsEstimate]]'s
    * probe — an unfiltered NULL would be counted here yet estimate 0
    * there, silently breaking the no-undercount guarantee for every
    * caller who probes with NULL. Track NULLs with an explicit
    * `count(col.isNull)` alongside the sketch if they matter.
    */
  def cmsCells(
      df: DataFrame, valueCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"depth $depth / width $width must be > 0")
    df.select(col(valueCol).as("v"))
      .filter(col("v").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("v"))
      .select(col("r"), cmsBucket(col("r"), col("v"), width).as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Element-wise sum of two cell frames — the exact merge that lets
    * per-shard sketches roll up without re-reading raw data.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("bucket"))
      .agg(sum(col("n")).as("n"))

  /** Point-frequency estimates for `probes` against a cell frame:
    * `min` over the depth rows' buckets, missing cells count 0 (so
    * never-seen probes estimate 0, and every estimate ≥ the true
    * count — CMS never undercounts). The sketch side broadcasts
    * (`depth·width` rows); the probe explode is map-only.
    * Output: `(valueCol, n_est)`. NULL probes are excluded (no output
    * row), mirroring [[cmsCells]]'s null exclusion — the sketch holds
    * no NULL counts, so any NULL estimate would be a lie.
    */
  def cmsEstimate(
      cells: DataFrame, probes: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame =
    probes.select(col(valueCol).as("v")).distinct()
      .filter(col("v").isNotNull)
      .select(col("v"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col("v"), width))
      .join(broadcast(cells), Seq("r", "bucket"), "left")
      .groupBy(col("v"))
      .agg(min(coalesce(col("n"), lit(0L))).as("n_est"))
      .withColumnRenamed("v", valueCol)

  /** DuckDB rendering of [[cmsCells]] + [[cmsEstimate]] probed with
    * the table's own distinct values, alongside the true counts —
    * the `overcount = n_est - n_true ≥ 0` column makes the
    * no-undercount property visible in the gated data itself.
    */
  def cmsCountsSql(
      table: String, valueCol: String, depth: Int, width: Int): String = {
    def bucket(r: String, v: String) =
      s"CAST(('0x' || substr(md5(CAST($r AS VARCHAR) || ':' || " +
        s"CAST($v AS VARCHAR)), 1, 15)) AS BIGINT) % $width"
    s"""WITH t AS (SELECT $valueCol AS v0, COUNT(*) AS n_true
       |  FROM $table WHERE $valueCol IS NOT NULL GROUP BY $valueCol),
       |rr AS (SELECT unnest(range(0, $depth)) AS r),
       |cells AS (SELECT r, ${bucket("r", valueCol)} AS bucket, COUNT(*) AS n
       |  FROM $table, rr WHERE $valueCol IS NOT NULL GROUP BY r, bucket),
       |probe AS (SELECT t.v0, rr.r, ${bucket("rr.r", "t.v0")} AS bucket
       |  FROM t, rr),
       |est AS (SELECT v0, MIN(COALESCE(n, 0)) AS n_est
       |  FROM probe LEFT JOIN cells c
       |    ON c.r = probe.r AND c.bucket = probe.bucket
       |  GROUP BY v0)
       |SELECT t.v0 AS $valueCol, n_true, n_est, n_est - n_true AS overcount
       |FROM t JOIN est USING (v0) ORDER BY $valueCol""".stripMargin
  }

  /** DuckDB rendering of [[cmsCells]] alone — the raw `(r, bucket, n)`
    * cell frame (deterministic integers, so the sketch STATE itself
    * can sit under a hash gate, e.g. against the streaming twin's
    * final snapshot). `r` is cast to INT to match Spark's
    * `sequence(0, depth-1)` element type.
    */
  def cmsCellsSql(
      table: String, valueCol: String, depth: Int, width: Int): String = {
    val bucket =
      s"CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || " +
        s"CAST($valueCol AS VARCHAR)), 1, 15)) AS BIGINT) % $width"
    s"""WITH rr AS (SELECT unnest(range(0, $depth)) AS r)
       |SELECT CAST(r AS INT) AS r, $bucket AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n
       |FROM $table, rr WHERE $valueCol IS NOT NULL
       |GROUP BY 1, 2 ORDER BY r, bucket""".stripMargin
  }

  /** DuckDB rendering of [[kmvHash]] + normalization for value
    * expression `v`.
    */
  def kmvHashSql(v: String): (String, String) = {
    val hi = s"CAST(('0x' || substr(md5(CAST($v AS VARCHAR)), 1, 15)) AS BIGINT)"
    (hi, s"CAST($hi AS DOUBLE) / $HashSpan")
  }

  /** DuckDB rendering of [[kmvDistinct]] over `table.valueCol`. */
  def kmvDistinctSql(table: String, valueCol: String, k: Int): String = {
    val (hi, _) = kmvHashSql("v")
    s"""WITH d AS (SELECT DISTINCT $valueCol AS v FROM $table
       |  WHERE $valueCol IS NOT NULL),
       |h AS (SELECT $hi AS hi FROM d),
       |sk AS (SELECT hi, CAST(hi AS DOUBLE) / $HashSpan AS hn FROM h
       |  ORDER BY hi LIMIT $k)
       |SELECT COUNT(*) AS n_kept, MAX(hn) AS kth_hash,
       |  CASE WHEN COUNT(*) < $k THEN CAST(COUNT(*) AS DOUBLE)
       |       ELSE ${k - 1}.0 / MAX(hn) END AS n_distinct_est
       |FROM sk""".stripMargin
  }

  /** DuckDB rendering of [[kmvDistinctPerGroup]] over
    * `table.(groupCol, valueCol)`.
    */
  def kmvGroupsSql(
      table: String, groupCol: String, valueCol: String, k: Int): String = {
    val (hi, _) = kmvHashSql("v")
    s"""WITH d AS (SELECT DISTINCT $groupCol AS g, $valueCol AS v FROM $table
       |  WHERE $valueCol IS NOT NULL),
       |h AS (SELECT g, $hi AS hi FROM d),
       |r AS (SELECT g, hi, CAST(hi AS DOUBLE) / $HashSpan AS hn,
       |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY hi) AS rn
       |  FROM h)
       |SELECT g AS $groupCol, CAST(COUNT(*) AS INT) AS n_kept,
       |  CASE WHEN COUNT(*) < $k THEN CAST(COUNT(*) AS DOUBLE)
       |       ELSE ${k - 1}.0 / MAX(hn) END AS n_distinct_est
       |FROM r WHERE rn <= $k GROUP BY g ORDER BY g""".stripMargin
  }
}
