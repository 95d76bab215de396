package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Three index shapes:
  *   - [[bruteForceTopK]] — exact cosine top-k via a cross join +
  *     window. Correct baseline; O(|Q|·|C|) comparisons. At 100 TB use
  *     it only for small query sets against broadcastable candidates,
  *     or as the verifier for the approximate paths.
  *   - [[lshTopK]] — random-hyperplane LSH: each vector gets a
  *     `planes`-bit signature (sign of dot with deterministic
  *     pseudo-random hyperplanes); candidates share a bucket with the
  *     query, so the cross join shrinks to a per-bucket join keyed by
  *     signature. The plane weights derive from md5(plane:dim) — no
  *     RNG state, reproducible across runs AND engines (the DuckDB
  *     oracle evaluates the identical function, [[lshTopKSql]]).
  *     Probing multiple buckets (bit-flip neighborhoods) trades recall
  *     for cost; here we probe the exact bucket plus all 1-bit flips.
  *   - IVF (inverted file): a coarse quantizer partitions the corpus
  *     into cells; queries scan only the `nProbe` nearest cells.
  *     [[ivfTopKHashCells]] picks cell centroids deterministically
  *     (smallest md5(id) — a seeded sample, i.e. k-means random init
  *     without Lloyd refinement), which makes the whole pipeline
  *     SQL-expressible and exactly oracle-checkable. [[ivfTopK]] adds
  *     k-means refinement (better cell balance) trained on a bounded
  *     deterministic sample — spec-verified by recall against brute
  *     force.
  *
  * Cosine arithmetic is done in doubles with a sequential fold
  * (`aggregate` over `zip_with`), which both Spark and DuckDB evaluate
  * left-to-right — bit-identical results, so the oracle can compare
  * exact values rather than tolerances.
  *
  * Per-row constants are hoisted out of pair-scoring joins: vector
  * norms are computed once per row (`_norm` columns) rather than per
  * candidate pair, and the LSH hyperplane weight matrix lives inside
  * the fused [[graft.functions.LshBandKeys]] expression — a pure
  * function of the configuration, derived once and shipped as one
  * compact codegen reference object per stage rather than as
  * per-plane literal expression trees (which the optimizer duplicated
  * into every operator using the keys: 14 MiB task binaries at 192
  * planes). Evaluating md5 per ROW would only re-derive the same
  * constants inside the scan. Values are bit-identical either way;
  * the oracle SQL still spells out the md5 arithmetic symbolically.
  */
object Ann {

  /** Sequential-fold dot product of two numeric-array columns, in
    * doubles. Backed by the codegen'd [[graft.functions.VecDot]]
    * expression — bit-identical to the
    * `aggregate(zip_with(...))` higher-order formulation (same element
    * order, widening and fold) but one fused Java loop per pair
    * instead of interpreted lambda dispatch per element.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given pre-computed norms (per-row constants hoisted out of
    * the pair join). Same operand order as [[cosine]] — bit-identical.
    */
  private[ann] def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** DuckDB rendering of [[cosine]] for 1-based list columns A/B of
    * dimension `dim` (list_reduce folds left-to-right like Spark's
    * `aggregate`).
    */
  def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)} / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)})))"

  /** DuckDB rendering of [[dot]] for 1-based list columns of dimension
    * `dim` (list_reduce folds left-to-right like Spark's `aggregate`).
    */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, v) -> acc + v)"

  /** Exact cosine top-k: for each query vector, the `k` most similar
    * candidates (ties broken by candidate id).
    *
    * Zero-norm vectors are excluded on both sides before scoring —
    * cosine against a zero vector is 0/0, which Spark evaluates to
    * NaN and then RANKS FIRST (NaN sorts above every double), while
    * SQL engines yield NULL and rank it last: an engine-divergent
    * phantom top-1. Applied uniformly across every scoring path here
    * ([[lshTopK]], [[ivfTopKHashCells]], [[ivfTopK]], the near-dup
    * pair scans) and mirrored in each oracle rendering.
    */
  def bruteForceTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true,
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")).filter(col("qn") > 0)
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn")).filter(col("cn") > 0)
    // excludeSelf drops same-id pairs — right when queries ⊆ candidates
    // (the self-search demos); set false when the two frames are
    // independent corpora whose id spaces may legitimately collide
    val scored = q.join(c,
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("qn"), col("cn")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Bounded-heap per-query ranking of a scored pair frame — the
    * retrieval tail shared by EVERY approximate path: [[pqTopK]],
    * [[ivfPqTopK]], [[lshTopK]], [[ivfTopKHashCells]], [[ivfTopK]],
    * and [[Binary.hammingTopK]]/[[Binary.hammingRerank]]: turns
    * `(query_id, neighbor_id, metric)` into `(query_id, neighbor_id,
    * rank, metric)` keeping the best `k` per query via the
    * [[graft.functions.TopK]] aggregator, NOT a `row_number` window.
    *
    * Why it matters at corpus scale: in the scored frames feeding
    * these paths each query's partition is the (probed slice of the)
    * whole corpus, so the window formulation sorts a corpus-sized
    * partition per query — a spill-prone single-reducer sort.
    * The aggregator's state never exceeds `k` pairs: partial
    * aggregation truncates map-side, the shuffle moves
    * O(queries·partitions·k), and no full-partition sort ever runs.
    * ([[bruteForceTopK]] keeps the window on purpose — it is the
    * exact-baseline verifier whose all-pairs scan is already the
    * documented non-scalable arm.)
    *
    * `ascending = true` ranks the SMALLEST metric first (distances:
    * hamming, ADC) by negating into the max-heap; `false` ranks the
    * largest first (scores: cosine). Ties break to the ascending
    * neighbor id either way — TopK's `(value desc, id asc)` rule is
    * exactly the family's `ORDER BY metric [DESC], id` convention.
    * Double negation is IEEE-exact, so the emitted metric is
    * bit-identical to the scored input. Requires an INTEGRAL,
    * non-null `neighbor_id` and non-null metric (the
    * [[graft.ops.Sampling.sampleExactK]] id contract; TopK skips
    * null pairs like `max_by`).
    */
  private[ann] def heapRank(
      scored: DataFrame, metric: String, metricType: String,
      k: Int, ascending: Boolean): DataFrame = {
    val signed = if (ascending) -col(metric) else col(metric)
    val recover = (v: Column) => (if (ascending) -v else v).cast(metricType)
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.TopK.top_k(
        signed.cast("double"), col("neighbor_id").cast("long"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__sel")))
      .select(col("query_id"), col("__sel")("id").as("neighbor_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        recover(col("__sel")("value")).as(metric))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * maps the top 60 bits of md5("plane:dim") to (-0.5, 0.5).
    * Computed once on the driver (plain Scala) — the exact arithmetic
    * of the DuckDB-side [[planeWeightSql]]: first 15 hex chars of the
    * md5 parsed base-16, mod 100000, scaled. md5-keyed (not xxhash64)
    * so the oracle computes the identical value; a production
    * deployment would swap in xxhash64 for seed-matrix generation
    * without changing any plan shape.
    */
  private[ann] def planeWeightValue(plane: Int, dim1: Int): Double =
    graft.functions.LshBandKeys.planeWeight(plane, dim1)

  /** The full weight matrix: `planes` rows × `dim` (1-based) columns.
    * Spec/audit helper — the execution path ([[lshSignature]],
    * [[lshBandKeys]]) derives the same matrix inside the fused
    * [[graft.functions.LshBandKeys]] expression and never puts it in
    * the plan.
    */
  private[ann] def planeWeights(planes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until planes).map(p => (1 to dim).map(i => planeWeightValue(p, i)))

  /** DuckDB rendering of [[planeWeightValue]]; `p` and `i` are SQL
    * expressions for the plane index and the 1-based dimension.
    */
  private def planeWeightSql(p: String, i: String): String =
    s"((CAST(('0x' || substr(md5(CAST($p AS VARCHAR) || ':' || CAST($i AS VARCHAR)), 1, 15)) AS BIGINT) " +
      s"% 100000) / 100000.0 - 0.5)"

  /** `planes`-bit signature of a vector packed into ONE long: bit p =
    * sign of dot(v, plane_p). One band of the fused
    * [[graft.functions.LshBandKeys]] expression — all projections in
    * a single codegen loop, weight matrix as one per-stage reference
    * object, no literals in the expression tree.
    *
    * The single-long packing caps `planes` at 63 — fine for
    * [[lshTopK]] (whose bit-flip probing needs the packed form) but
    * NOT for banded near-dup search, where wide band keys are what
    * keeps candidate volume sub-quadratic: use [[lshBandKeys]] there.
    *
    * `dim` must match the actual vector length (it defaults to 64, the
    * testdata embedding width — callers with other widths MUST pass
    * their own): a mismatched non-null vector raises rather than
    * silently producing all-zero signatures (collapsing every row
    * into one bucket — a hidden O(n²)). Null vectors keep their null
    * signature, as before.
    */
  def lshSignature(vec: Column, planes: Int, dim: Int = 64): Column = {
    require(planes > 0 && planes <= 63,
      s"lshSignature packs into one long: 0 < planes <= 63, got $planes")
    element_at(
      graft.functions.LshBandKeys.lsh_band_keys(vec, 1, planes, dim), 1)
  }

  /** DuckDB rendering of [[lshSignature]] for list column `vecExpr`
    * of dimension `dim`.
    */
  def lshSignatureSql(vecExpr: String, planes: Int, dim: Int): String =
    (0 until planes).map { p =>
      val proj = s"list_reduce(list_transform(range(1, ${dim + 1}), i -> " +
        s"CAST($vecExpr[i] AS DOUBLE) * ${planeWeightSql(p.toString, "i")}), (acc, v) -> acc + v)"
      s"(CASE WHEN $proj > 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  /** Per-band LSH keys for `bands`·`r` hyperplanes, as an
    * `array<bigint>` of length `bands`: band b's key packs the sign
    * bits of planes [b·r, (b+1)·r) at local positions 0..r-1. Unlike
    * [[lshSignature]] (one packed long, ≤ 63 planes total), the
    * per-band rendering supports any plane count, so each band key
    * can be 12-16 bits wide — 4096-65536 buckets per band. That width
    * is the structural defence against the quadratic candidate cliff:
    * chance collisions pass at rate bands/2^r of ALL pairs, so r=3
    * (8 buckets) admits a constant ~2-12% of n² regardless of corpus
    * content while r=12 admits ~0.4%. Same md5-derived literal plane
    * weights as [[lshSignature]]; same `dim` contract (defaults to
    * the 64-wide testdata embeddings — callers with other widths MUST
    * pass theirs; mismatched non-null vectors raise, null vectors
    * yield a null key array).
    *
    * Backed by the fused [[graft.functions.LshBandKeys]] expression:
    * all bands·r projections run in one codegen loop; the weight
    * matrix ships as one ~100 KB reference object per stage instead
    * of per-plane literal trees duplicated into every operator, so
    * wide configurations (192 planes) cost kilobytes of task binary,
    * not megabytes.
    */
  def lshBandKeys(vec: Column, bands: Int, r: Int, dim: Int = 64): Column =
    graft.functions.LshBandKeys.lsh_band_keys(vec, bands, r, dim)

  /** DuckDB rendering of one [[lshBandKeys]] band key (band index
    * `band`, `r` planes per band) for list column `vecExpr` of
    * dimension `dim`.
    */
  def lshBandKeySql(vecExpr: String, band: Int, r: Int, dim: Int): String =
    (0 until r).map { i =>
      val p = band * r + i
      val proj = s"list_reduce(list_transform(range(1, ${dim + 1}), i -> " +
        s"CAST($vecExpr[i] AS DOUBLE) * ${planeWeightSql(p.toString, "i")}), (acc, v) -> acc + v)"
      s"(CASE WHEN $proj > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  /** Probe masks for [[lshTopK]]: the query's own bucket, every
    * 1-bit flip, and (at `multiProbe = 2`) every 2-bit flip — the
    * standard multi-probe LSH recall/cost dial. Probe count is
    * 1 + p at level 1 and 1 + p + p(p−1)/2 at level 2 (79 for the
    * default 12 planes): each probe multiplies the candidate volume
    * by its bucket's occupancy, so level 2 trades ~6× candidates for
    * the ~6× recall gain of reaching hamming-2 buckets.
    */
  private[ann] def probeMasks(planes: Int, multiProbe: Int): Seq[Long] = {
    require(multiProbe == 1 || multiProbe == 2,
      s"multiProbe $multiProbe must be 1 (own + 1-bit) or 2 (+ 2-bit)")
    val one = Seq(0L) ++ (0 until planes).map(p => 1L << p)
    if (multiProbe == 1) one
    else one ++ (for {
      a <- 0 until planes; b <- a + 1 until planes
    } yield (1L << a) | (1L << b))
  }

  /** LSH-bucketed ANN: candidates must share the query's bucket or a
    * bucket within `multiProbe` bit flips of it. Returns the same
    * schema as [[bruteForceTopK]]; recall < 1 by construction
    * (candidates at `multiProbe = 2` are a strict superset of level
    * 1, so recall is monotone in the dial — AnnSpec pins this).
    *
    * `dim` must equal the embedding width (see [[lshSignature]] —
    * mismatches raise rather than silently single-bucketing).
    */
  def lshTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 12, dim: Int = 64,
      multiProbe: Int = 1,
  ): DataFrame = {
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"),
      lshSignature(col(vecCol), planes, dim).as("bucket"))
      .filter(col("cn") > 0) // zero-norm: see bruteForceTopK
    val probes = probeMasks(planes, multiProbe).map(lit)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"),
      lshSignature(col(vecCol), planes, dim).as("qsig"))
      .filter(col("qn") > 0)
    // PAYLOAD-FREE probe join: the explode multiplies query rows by
    // the probe count (79 at the default dial, 154 at two-bit probes
    // over 17 planes), so the dim-wide vector must NOT ride through
    // it — carrying qv here cost an ~8x wall-clock multiple on a
    // corpus-sized query side (measured at the margin-mining 30x
    // point: 27.4s -> the raw id-only join's 3.6s). Ids and buckets
    // go through the explode; vectors join back onto the DEDUPED
    // pair set once per pair (each side's signature scan re-executes
    // once for that re-join — map-only, cheap next to shuffling the
    // payload probe-count times).
    val pairs = q.select(col("query_id"),
        explode(array(probes.map(m => col("qsig").bitwiseXOR(m)): _*))
          .as("bucket"))
      .join(c.select(col("neighbor_id"), col("bucket")), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = pairs
      .join(q.select(col("query_id"), col("qv"), col("qn")), Seq("query_id"))
      .join(c.select(col("neighbor_id"), col("cv"), col("cn")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("qn"), col("cn")).as("score"))
    // each query's scored partition is every row sharing a probed
    // bucket — a corpus FRACTION, not a constant — so rank through the
    // bounded-heap TopK aggregate, not a per-query window sort
    heapRank(scored, "score", "double", k, ascending = false)
  }

  /** DuckDB rendering of [[lshTopK]] over `embeddings(vec_id,
    * embedding)` with queries restricted by `queryWhere`.
    */
  def lshTopKSql(
      queryWhere: String, k: Int, planes: Int = 12, dim: Int = 64,
      multiProbe: Int = 1,
  ): String = {
    val sig = lshSignatureSql("embedding", planes, dim)
    val masks = probeMasks(planes, multiProbe).mkString(", ")
    val nz = s"${dotSql("embedding", "embedding", dim)} > 0"
    s"""WITH c AS (SELECT vec_id AS neighbor_id, embedding AS cv, $sig AS bucket
       |  FROM embeddings WHERE $nz),
       |q0 AS (SELECT vec_id AS query_id, embedding AS qv, $sig AS qsig
       |  FROM embeddings WHERE ($queryWhere) AND $nz),
       |q AS (SELECT query_id, qv, xor(qsig, m.mask) AS bucket
       |  FROM q0 CROSS JOIN (SELECT unnest([$masks]) AS mask) m),
       |scored AS (SELECT DISTINCT query_id, neighbor_id,
       |    ${cosineSql("qv", "cv", dim)} AS score
       |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, score FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Deterministic IVF: the coarse quantizer's `nCells` centroids are
    * the candidates with the smallest md5(id) — a seeded uniform
    * sample, i.e. k-means random initialization without Lloyd
    * refinement (a standard, if lower-quality, inverted-file
    * quantizer). Fully deterministic and SQL-expressible
    * ([[ivfTopKHashCellsSql]]), so it sits under the exact-value
    * oracle gate.
    *
    * 100 TB shape: centroid pick is a global top-nCells (TakeOrdered,
    * no full sort); cell assignment and probe selection are *map-only*
    * scalar argmax over the broadcast centroid array (no shuffle, no
    * row blow-up); the scored join shuffles only on cell id. Size
    * `nCells` ≫ parallelism at scale (e.g. 4–16× executor count) so
    * cells spread across reducers. Centroid norms are precomputed in
    * the broadcast struct and row norms once per row, so assignment is
    * one dot product per centroid.
    */
  def ivfTopKHashCells(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
  ): DataFrame = {
    // single-row DataFrame holding the centroid array (with
    // precomputed norms), for broadcast. Zero-norm vectors are
    // excluded here and from both scored sides (see bruteForceTopK):
    // a zero centroid would make every assignment cosine NaN.
    val cents = candidates
      .select(col(idCol).as("cell"), col(vecCol).as("centroid"))
      .filter(norm(col("centroid")) > 0)
      .withColumn("ck", md5(col("cell").cast("string")))
      .orderBy(col("ck"), col("cell")).limit(nCells)
      .agg(collect_list(struct(col("cell"), col("centroid"),
        norm(col("centroid")).as("cnorm"))).as("cents"))

    def cellScores(vec: Column, vnorm: Column): Column =
      transform(col("cents"), ct =>
        struct((dot(vec, ct("centroid")) / (vnorm * ct("cnorm"))).as("cos"),
          (-ct("cell")).as("negcell"), ct("cell").as("cell")))

    // map-only assignment: argmax cosine (ties -> smallest cell id)
    val assigned = candidates
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm(col(vecCol)).as("cn"))
      .filter(col("cn") > 0)
      .crossJoin(broadcast(cents))
      .withColumn("cell", array_max(cellScores(col("cv"), col("cn")))("cell"))
      .select(col("neighbor_id"), col("cv"), col("cn"), col("cell"))

    // map-only probe selection: top-nProbe cells by cosine. `scores`
    // is materialized as its own column so the sort input is computed
    // once; the slice length is clamped so corpora smaller than
    // nProbe keep all available cells (a negative-start slice past
    // the array head would otherwise return empty).
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn"))
      .filter(col("qn") > 0)
      .crossJoin(broadcast(cents))
      .withColumn("scores", array_sort(cellScores(col("qv"), col("qn"))))
      .filter(size(col("scores")) > 0)
      .withColumn("np", least(lit(nProbe), size(col("scores"))))
      .withColumn("probe", explode(slice(col("scores"), -col("np"), col("np"))))
      .select(col("query_id"), col("qv"), col("qn"), col("probe.cell").as("cell"))

    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("qn"), col("cn")).as("score"))
      .dropDuplicates("query_id", "neighbor_id")
    // nProbe/nCells of the corpus lands in each query's partition —
    // linear in corpus size, so heap-rank it (see [[heapRank]])
    heapRank(scored, "score", "double", k, ascending = false)
  }

  /** DuckDB rendering of [[ivfTopKHashCells]] over
    * `embeddings(vec_id, embedding)` with queries restricted by
    * `queryWhere`. (The oracle uses window-ranked argmax — value-equal
    * to Spark's scalar argmax: max cosine, ties to smallest cell id.)
    */
  def ivfTopKHashCellsSql(
      queryWhere: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4, dim: Int = 64,
  ): String = {
    val nz = s"${dotSql("embedding", "embedding", dim)} > 0"
    s"""WITH cents AS (SELECT vec_id AS cell, embedding AS centroid
       |  FROM embeddings WHERE $nz
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells),
       |assign0 AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, c.cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosineSql("e.embedding", "c.centroid", dim)} DESC, c.cell) AS rn
       |  FROM (SELECT * FROM embeddings WHERE $nz) e CROSS JOIN cents c),
       |assigned AS (SELECT neighbor_id, cv, cell FROM assign0 WHERE rn = 1),
       |probe0 AS (SELECT q.vec_id AS query_id, q.embedding AS qv, c.cell,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosineSql("q.embedding", "c.centroid", dim)} DESC, c.cell) AS rn
       |  FROM (SELECT * FROM embeddings WHERE ($queryWhere) AND $nz) q CROSS JOIN cents c),
       |probes AS (SELECT query_id, qv, cell FROM probe0 WHERE rn <= $nProbe),
       |scored AS (SELECT DISTINCT query_id, neighbor_id,
       |    ${cosineSql("qv", "cv", dim)} AS score
       |  FROM probes JOIN assigned USING (cell) WHERE query_id <> neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, score FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** The bounded, deterministic training sample for [[ivfTopK]]'s
    * k-means quantizer: the `maxTrainRows` candidates with smallest
    * md5(seed:id). A TakeOrdered top-k — independent of input
    * partitioning, and the fit input stays bounded at any corpus
    * scale (the full corpus is only ever touched by the single
    * assignment map pass).
    */
  def quantizerSample(
      candidates: DataFrame, idCol: String, vecCol: String,
      maxTrainRows: Int, seed: Long,
  ): DataFrame =
    candidates
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .orderBy(md5(concat(lit(s"$seed:"), col("neighbor_id").cast("string"))),
        col("neighbor_id"))
      .limit(maxTrainRows)

  /** IVF with a k-means coarse quantizer (better-balanced cells than
    * [[ivfTopKHashCells]]): fit on [[quantizerSample]] (bounded;
    * never the full corpus), assign the corpus in one map pass,
    * probe the `nProbe` nearest cells per query. Approximate and
    * engine-specific (k-means float reductions) — verified by recall
    * against [[bruteForceTopK]] in the spec suite rather than the
    * value-exact oracle.
    */
  def ivfTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      maxTrainRows: Int = 100000,
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val train = quantizerSample(candidates, idCol, vecCol, maxTrainRows, seed)
      .withColumn("features", array_to_vector(col("cv")))
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .setMaxIter(8) // coarse quantizer: cell quality saturates fast
      .fit(train)
    val assigned = model.transform(
      candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
        .withColumn("features", array_to_vector(col("cv"))))
      .select(col("neighbor_id"), col("cv"), norm(col("cv")).as("cn"),
        col("prediction").as("cell"))
      .filter(col("cn") > 0) // zero-norm: see bruteForceTopK

    // rank each query's distance to every centroid, keep nProbe cells
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }.toSeq
    val cents = queries.sparkSession.createDataFrame(centroids)
      .toDF("cell", "centroid")
      .agg(collect_list(struct(col("cell"), col("centroid"),
        norm(col("centroid")).as("cnorm"))).as("cents"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")).filter(col("qn") > 0)
    // map-only probe selection (same device as [[ivfTopKHashCells]]):
    // sort the <= nCells-entry struct array, slice the tail — cosine
    // desc, ties to smallest cell via the negated-cell middle field.
    // No window: a query_id-partitioned window here (though bounded)
    // would break the family's window-free retrieval plan pin.
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("scores", array_sort(transform(col("cents"), ct =>
        struct((dot(col("qv"), ct("centroid")) / (col("qn") * ct("cnorm"))).as("cos"),
          (-ct("cell")).as("negcell"), ct("cell").as("cell")))))
      .filter(size(col("scores")) > 0)
      .withColumn("np", least(lit(nProbe), size(col("scores"))))
      .withColumn("probe", explode(slice(col("scores"), -col("np"), col("np"))))
      .select(col("query_id"), col("qv"), col("qn"), col("probe.cell").as("cell"))

    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("qn"), col("cn")).as("score"))
      .dropDuplicates("query_id", "neighbor_id")
    // probed cells hold ~nProbe/nCells of the corpus per query —
    // heap-rank the tail like every other approximate retrieval path
    heapRank(scored, "score", "double", k, ascending = false)
  }

  /** Majority-vote label assignment from a precomputed neighbor frame
    * — the core of kNN classification / label propagation for weak
    * supervision. `neighbors` has the [[bruteForceTopK]] shape
    * `(query_id, neighbor_id, rank, score)` (any of the top-k paths
    * produces it — brute force as the exact baseline, [[lshTopK]] /
    * [[ivfTopKHashCells]] as the scale paths); `labeled` supplies
    * `(idCol, labelCol)`. Ties break to the smallest label, so the
    * vote is deterministic and oracle-checkable.
    *
    * 100 TB shape: one join of the neighbor list against the label
    * table on neighbor id (broadcast when the labeled set is small —
    * the weak-supervision norm), a (query, label) count with map-side
    * combine, and a per-query window for the argmax. No all-pairs
    * work beyond what the neighbor search already did.
    */
  def classifyFromNeighbors(
      neighbors: DataFrame, labeled: DataFrame,
      idCol: String, labelCol: String,
  ): DataFrame = {
    val votes = neighbors
      .join(labeled.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("label")), Seq("neighbor_id"))
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    // asc_nulls_last: Spark default-sorts NULL labels first, SQL
    // engines last — a NULL-labeled tie must lose on both engines
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc_nulls_last)
    votes.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
  }

  /** kNN classification with the exact brute-force neighbor search:
    * each `queries` row gets the majority label of its `k` nearest
    * `labeled` rows by cosine. The exact baseline — swap in an
    * approximate top-k frame via [[classifyFromNeighbors]] at corpus
    * scale.
    *
    * `excludeSelf` (default true) treats a labeled row sharing the
    * query's id as the query itself and drops it — right when the
    * query set is a subset of the labeled corpus. Pass false when the
    * two frames are independent datasets whose id spaces collide by
    * coincidence ([[knnClassifySql]] mirrors the same switch).
    */
  def knnClassify(
      queries: DataFrame, labeled: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int,
      excludeSelf: Boolean = true,
  ): DataFrame =
    classifyFromNeighbors(
      bruteForceTopK(queries, labeled, idCol, vecCol, k, excludeSelf),
      labeled, idCol, labelCol)

  /** Mutual (reciprocal) kNN pairs — edges `(a, b)` where EACH
    * endpoint ranks the other inside its own top-k: the standard
    * robustification of raw nearest-neighbor pairs for near-dup and
    * alignment mining (a hub vector sits in everyone's top-k, but
    * reciprocity kills the hub edges because the hub's OWN top-k
    * holds only its true neighbors — asymmetric neighbor lists are
    * the noise, mutual ones the signal).
    *
    * Takes any `(query_id, neighbor_id, …)` top-k frame — at corpus
    * scale feed an approximate path ([[lshTopK]], [[ivfPqTopK]],
    * [[Binary.hammingTopK]]); the brute-force arm is the gate's
    * exact baseline. The reciprocity filter itself is one canonical
    * projection + one hash semi join on the pair key — output-sized,
    * nothing quadratic.
    *
    * Output: `(id_a, id_b)` with `id_a < id_b`, each inside the
    * other's top-k.
    */
  def mutualPairs(topk: DataFrame): DataFrame = {
    val fwd = topk
      .filter(col("query_id") < col("neighbor_id"))
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"))
    val rev = topk
      .filter(col("neighbor_id") < col("query_id"))
      .select(col("neighbor_id").as("id_a"), col("query_id").as("id_b"))
    fwd.join(rev, Seq("id_a", "id_b"), "left_semi")
  }

  /** DuckDB rendering of brute-force self-kNN + [[mutualPairs]] over
    * `embeddings(vec_id, embedding)` restricted by `whereClause`.
    */
  def mutualKnnPairsSql(
      whereClause: String, k: Int, dim: Int = 64): String = {
    val nz = s"${dotSql("embedding", "embedding", dim)} > 0"
    s"""WITH v AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE ($whereClause) AND $nz),
       |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ${cosineSql("a.embedding", "b.embedding", dim)} AS score
       |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
       |topk AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, neighbor_id) AS rank
       |    FROM scored) r WHERE rank <= $k),
       |fwd AS (SELECT query_id AS id_a, neighbor_id AS id_b FROM topk
       |  WHERE query_id < neighbor_id),
       |rev AS (SELECT neighbor_id AS id_a, query_id AS id_b FROM topk
       |  WHERE neighbor_id < query_id)
       |SELECT fwd.id_a, fwd.id_b FROM fwd
       |WHERE EXISTS (SELECT 1 FROM rev
       |  WHERE rev.id_a = fwd.id_a AND rev.id_b = fwd.id_b)
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB rendering of [[knnClassify]] over `embeddings(vec_id,
    * embedding, label)`: queries restricted by `queryWhere`, labeled
    * corpus by `labeledWhere`.
    */
  def knnClassifySql(
      queryWhere: String, labeledWhere: String, k: Int, dim: Int = 64,
      excludeSelf: Boolean = true,
  ): String = {
    val nz = s"${dotSql("embedding", "embedding", dim)} > 0"
    val joinOn = if (excludeSelf) "query_id <> neighbor_id" else "TRUE"
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |  WHERE ($queryWhere) AND $nz),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label FROM embeddings
       |  WHERE ($labeledWhere) AND $nz),
       |scored AS (SELECT query_id, neighbor_id, label,
       |    ${cosineSql("qv", "cv", dim)} AS score
       |  FROM q JOIN c ON $joinOn),
       |topk AS (SELECT query_id, neighbor_id, label FROM (
       |    SELECT query_id, neighbor_id, label,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, neighbor_id) AS rank
       |    FROM scored) r WHERE rank <= $k),
       |votes AS (SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
       |  FROM topk GROUP BY 1, 2)
       |SELECT query_id, label AS pred_label, votes FROM (
       |  SELECT query_id, label, votes,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY votes DESC, label) AS rnk
       |  FROM votes) v WHERE rnk = 1 ORDER BY query_id""".stripMargin
  }

  /** Scalar int8 quantization of an embedding column with a
    * per-vector scale (max |x_i|): `q_i = floor(x_i / scale · 127 +
    * 0.5)` — in [-127, 127] by construction since |x_i/scale| ≤ 1.
    * The 100 TB storage lever: 4× smaller than float32 at ~0.4% max
    * reconstruction error per component.
    *
    * `floor(x + 0.5)` rather than `round(x)` because round's half-tie
    * behavior is engine-dependent while floor is exactly-rounded IEEE
    * everywhere — the whole pipeline (scale, quantize, dequantize,
    * error) is bit-identical across engines and sits under the oracle
    * gate. Map-only; the scale is projected as a column BEFORE the
    * per-element lambdas so it is computed once per row, not per
    * element.
    *
    * Output: (id, v, qscale, qvec).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("qscale",
        array_max(transform(col("v"), x => abs(x.cast("double")))))
      .withColumn("qvec", transform(col("v"), x =>
        when(col("qscale") > 0,
          floor(x.cast("double") / col("qscale") * 127.0 + lit(0.5)))
          .otherwise(lit(0.0)).cast("int")))

  /** Max per-component reconstruction error of [[quantizeInt8]]
    * (dequantize = q/127·scale), as a scalar per vector — the quality
    * audit column.
    */
  def dequantMaxError(v: Column, qvec: Column, qscale: Column): Column =
    array_max(zip_with(v, qvec, (x, q) =>
      abs(q.cast("double") / 127.0 * qscale - x.cast("double"))))

  /** DuckDB rendering of [[quantizeInt8]]'s per-vector scale (max
    * |x_i|) for list expression `v`. Shared by every oracle that
    * models the quantizer, so a rounding/scale change can't desync
    * one of them silently.
    */
  def qscaleSql(v: String): String =
    s"list_max(list_transform($v, x -> abs(CAST(x AS DOUBLE))))"

  /** DuckDB rendering of [[quantizeInt8]]'s per-element quantize step
    * (`floor(x/scale·127 + 0.5)` as INT, zero-scale-safe) for scalar
    * expression `x` and scale expression `scale`. The single source
    * of truth for the quantize arithmetic on the oracle side — used
    * by [[quantizeInt8Sql]] AND by derived-corpus oracles that build
    * quantize→dequantize twins.
    */
  def quantizeElemSql(x: String, scale: String): String =
    s"""CAST(CASE WHEN $scale > 0
       |      THEN floor(CAST($x AS DOUBLE) / $scale * 127.0 + 0.5)
       |      ELSE 0.0 END AS INT)""".stripMargin

  /** DuckDB rendering of the dequantized value of quantized element
    * `q` at scale `scale` (`q/127·scale` in doubles) — the inverse
    * step, kept beside [[quantizeElemSql]] for the same
    * single-source-of-truth reason.
    */
  def dequantElemSql(q: String, scale: String): String =
    s"CAST($q AS DOUBLE) / 127.0 * $scale"

  /** DuckDB rendering of the quantize → dequantize-error pipeline over
    * `embeddings(vec_id, embedding)` restricted by `whereClause`. The
    * error fold ranges over `len(v)` (not a caller-supplied dim), so a
    * dimension drift can't silently truncate the oracle-side maximum.
    */
  def quantizeInt8Sql(whereClause: String): String =
    s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings $whereClause),
       |s AS (SELECT id, v,
       |    ${qscaleSql("v")} AS qscale
       |  FROM e),
       |q AS (SELECT id, v, qscale,
       |    list_transform(v, x -> ${quantizeElemSql("x", "qscale")}) AS qvec
       |  FROM s)
       |SELECT id, qscale,
       |  list_max(list_transform(range(1, len(v) + 1), i ->
       |    abs(${dequantElemSql("qvec[i]", "qscale")} - CAST(v[i] AS DOUBLE)))) AS max_abs_err
       |FROM q ORDER BY id""".stripMargin

  /** Matryoshka-style truncation: keep the first `dims` components
    * and re-normalize to unit length — the MRL storage/latency lever
    * (embeddings trained with matryoshka losses keep most of their
    * retrieval quality in a prefix, so an index can store d/4 dims at
    * 4× density and rescore survivors at full precision). Map-only at
    * any scale.
    *
    * Engine-exactness: the squared-norm fold is a FIXED left-to-right
    * IEEE sequence (Spark's `aggregate` with a 0.0 seed ≡ DuckDB's
    * seedless `list_reduce` — adding 0.0 to the first square is exact
    * since squares are never -0.0), `sqrt` is IEEE-correctly-rounded,
    * and each output component is one division — so the doubles are
    * bit-identical across engines and the gate can hash them raw.
    * Zero vectors renormalize to zeros (same NULL-free convention as
    * [[quantizeInt8]]).
    *
    * Output: (id, tnorm, tvec) — the PRE-normalization norm of the
    * truncated prefix (the energy retained, an audit column) and the
    * renormalized `dims`-component vector as doubles.
    */
  def mrlTruncate(df: DataFrame, idCol: String, vecCol: String, dims: Int): DataFrame = {
    require(dims >= 1, s"dims $dims must be >= 1")
    df.select(col(idCol).as("id"),
        transform(slice(col(vecCol), 1, dims), x => x.cast("double")).as("__h"))
      .withColumn("tnorm",
        sqrt(aggregate(col("__h"), lit(0.0), (a, x) => a + x * x)))
      .select(col("id"), col("tnorm"),
        when(col("tnorm") > 0,
          transform(col("__h"), x => x / col("tnorm")))
          .otherwise(transform(col("__h"), _ => lit(0.0))).as("tvec"))
  }

  /** DuckDB rendering of [[mrlTruncate]] over `embeddings(vec_id,
    * embedding)` restricted by `whereClause`, EXPLODED to one row per
    * component `(id, tnorm, i, q)` — the gate-friendly scalar shape
    * (1-based `i`, raw double component).
    */
  def mrlTruncateSql(dims: Int, whereClause: String): String =
    s"""WITH e AS (SELECT vec_id AS id,
       |    list_transform(embedding[1:$dims], x -> CAST(x AS DOUBLE)) AS hv
       |  FROM embeddings $whereClause),
       |n AS (SELECT id, hv,
       |    sqrt(list_reduce(list_transform(hv, x -> x * x),
       |      (a, b) -> a + b)) AS tnorm
       |  FROM e),
       |x AS (SELECT id, tnorm, hv,
       |    unnest(range(1, len(hv) + 1)) AS i FROM n)
       |SELECT id, tnorm, i,
       |  CASE WHEN tnorm > 0 THEN hv[i] / tnorm ELSE 0.0 END AS q
       |FROM x""".stripMargin

  // ---- Product quantization ------------------------------------------

  /** Deterministic PQ codebooks: the `dim`-dim space splits into `m`
    * subspaces of `dim/m` dims; subspace `s`'s `k` centroids are the
    * `s`-th subvectors of a [[quantizerSample]]-style draw (md5-keyed
    * shuffle, first `k` — an unbiased deterministic sample, fetched
    * with a distributed TakeOrdered heap, never a global sort). No
    * iterative refinement: seed-drawn codebooks keep every step
    * md5-deterministic and oracle-expressible; a production deployment
    * would k-means-refine each subspace exactly as [[ivfTopK]] does
    * its coarse quantizer — engine-specific floats, recall-spec'd
    * rather than oracle-gated.
    *
    * Output: `(sub, code, centroid: array<double>[dim/m])`, `m·k`
    * rows — tiny at any corpus size; always broadcast downstream.
    */
  def pqCodebooks(
      candidates: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, dim: Int, seed: Long = 42L,
  ): DataFrame = {
    require(dim % m == 0, s"m $m must divide dim $dim")
    val d = dim / m
    val shuffleKey =
      md5(concat(lit(s"$seed:"), col("sid").cast("string")))
    val sample = candidates
      .select(col(idCol).as("sid"), col(vecCol).as("sv"))
      .orderBy(shuffleKey, col("sid"))
      .limit(k)
    // code assignment re-ranks only the k sampled rows (bounded window)
    val seeds = sample.withColumn("code",
      row_number().over(Window.orderBy(shuffleKey, col("sid"))) - 1)
    seeds
      .select(col("code"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("sv"))
      .select(col("sub"), col("code"),
        transform(slice(col("sv"), col("sub") * d + 1, lit(d)),
          x => x.cast("double")).as("centroid"))
  }

  /** OPQ-style subspace permutation (Ge et al. 2013, the PARAMETRIC
    * idea reduced to its axis-aligned deterministic form): PQ's
    * quantization error concentrates when a few subspaces hoard the
    * corpus' energy, so BALANCE them — census each dimension's
    * integer-quantized second moment (`Σ floor(x·1000)²`, BIGINT —
    * exact under any partitioning, the [[graft.text.Lm]] micro-unit
    * discipline; overflow past ~1e15 rows·unit-energy → lower the
    * quantum), rank dimensions by energy (ties to the lower index),
    * and deal them round-robin into the `m` subspaces so each gets
    * one dim from every energy tier. Output: `(perm_idx, dim_idx)` —
    * position `perm_idx` (0-based, subspace-major) of the permuted
    * vector takes source dimension `dim_idx`. The full OPQ learns a
    * rotation; the permutation is the engine-exact, oracle-gateable
    * member of the family, and composes with [[pqEncode]] by simply
    * permuting the vectors first ([[opqPermute]]).
    */
  def opqPermutation(
      candidates: DataFrame, vecCol: String,
      m: Int, dim: Int,
  ): DataFrame = {
    require(dim % m == 0, s"m $m must divide dim $dim")
    val energy = candidates
      .select(posexplode(transform(col(vecCol),
        x => {
          val q = floor(x.cast("double") * lit(1000.0)).cast("long")
          q * q
        })).as(Seq("dim_idx", "__e")))
      .groupBy(col("dim_idx"))
      .agg(sum(col("__e")).as("__energy"))
    val w = Window.orderBy(col("__energy").desc, col("dim_idx"))
    energy
      .withColumn("__rank", row_number().over(w) - 1) // bounded: dim rows
      .select(col("dim_idx"),
        ((col("__rank") % m) * lit(dim / m) +
          (col("__rank") / m).cast("int")).as("perm_idx"))
  }

  /** Apply an [[opqPermutation]] map-side: the permutation collects
    * to a `dim`-entry literal (bounded — one row per dimension) and
    * the reorder is a pure projection; compose with [[pqEncode]] /
    * [[pqTopKWithCodebooks]] on the permuted column.
    */
  def opqPermute(
      vecCol: String, permutation: DataFrame, dim: Int,
  ): Column = {
    val perm = new Array[Int](dim)
    val collected = permutation.select(col("perm_idx"), col("dim_idx")).collect()
    // a short permutation (empty candidate slice, mismatched dim)
    // would silently map every missing position to source dim 0 —
    // fail loudly instead
    require(collected.length == dim,
      s"permutation has ${collected.length} rows, need exactly $dim")
    collected.foreach(r => perm(r.getInt(0)) = r.getInt(1))
    val lut = array(perm.map(lit): _*)
    transform(sequence(lit(0), lit(dim - 1)),
      i => element_at(col(vecCol), element_at(lut, i + 1) + 1))
  }

  /** DuckDB rendering of [[opqPermutation]] + the permuted
    * [[pqEncodeSql]]-style encode over `embeddings` — ends with CTE
    * `pe(vec_id, embedding)` holding the PERMUTED vectors, for the
    * caller to splice a standard encode over.
    */
  def opqPermuteCtesSql(m: Int, dim: Int, whereClause: String): String =
    s"""src AS (SELECT vec_id, embedding FROM embeddings $whereClause),
       |en AS (SELECT i - 1 AS dim_idx,
       |    sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0) AS BIGINT)
       |      * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0) AS BIGINT))
       |      AS energy
       |  FROM (SELECT embedding, unnest(range(1, $dim + 1)) AS i FROM src)
       |  GROUP BY i - 1),
       |rk AS (SELECT dim_idx,
       |    CAST(row_number() OVER (ORDER BY energy DESC, dim_idx) AS INT)
       |      - 1 AS rnk
       |  FROM en),
       |pm AS (SELECT dim_idx,
       |    (rnk % $m) * ${dim / m} + rnk // $m AS perm_idx
       |  FROM rk),
       |pex AS (SELECT s.vec_id, p.perm_idx,
       |    CAST(s.embedding[p.dim_idx + 1] AS DOUBLE) AS x
       |  FROM src s, pm p),
       |pe AS (SELECT vec_id, list(x ORDER BY perm_idx) AS embedding
       |  FROM pex GROUP BY vec_id)""".stripMargin

  /** DuckDB rendering of the OPQ-permuted PQ encode: the permutation
    * CTEs feed `pe`, and the standard [[pqEncodeSql]] chain runs over
    * it (codebooks drawn from the PERMUTED slice, exactly like the
    * Spark composition).
    */
  def opqEncodeSql(
      m: Int, k: Int, dim: Int, seed: Long, whereClause: String): String = {
    val cols = (0 until m)
      .map(s => s"codes[${s + 1}] AS code_$s").mkString(", ")
    s"""WITH ${opqPermuteCtesSql(m, dim, whereClause)},
       |${pqCtesSql(m, k, dim, seed, "", from = "pe")}
       |SELECT id, $cols FROM codes ORDER BY id""".stripMargin
  }

  /** PRODUCTION-path PQ codebooks: per-subspace Lloyd (k-means)
    * refinement of the seed-drawn [[pqCodebooks]] init, exactly the
    * split [[ivfTopK]] makes for its coarse quantizer — the seeded
    * draw stays the oracle-gated twin (md5-deterministic,
    * SQL-expressible), this one trades oracle exactness for lower
    * quantization error and is verified by the recall spec instead
    * (PqSpec: refined recall@10 ≥ seed-drawn recall@10 on clustered
    * data).
    *
    * 100 TB shape: training touches only a [[quantizerSample]] —
    * `maxTrainRows` rows picked by a distributed TakeOrdered heap —
    * never the full corpus; the corpus is only ever read by the
    * single [[pqEncode]] assignment pass. The `m` per-subspace fits
    * run over that one bounded sample (persisted once, unpersisted on
    * exit), each an MLlib KMeans whose per-iteration centroid
    * reduction is map-side-combinable. Output matches [[pqCodebooks]]
    * (`(sub, code, centroid)`, `m·k` rows) so every downstream
    * consumer ([[pqEncode]], [[pqTopKWithCodebooks]]) is shared
    * between the twins.
    *
    * Codes are re-numbered by lexicographic centroid order so the
    * codebook is a pure function of the fitted centroid SET, not of
    * MLlib's internal cluster indexing.
    */
  def pqCodebooksRefined(
      candidates: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, dim: Int, seed: Long = 42L,
      maxTrainRows: Int = 100000, maxIter: Int = 8,
  ): DataFrame = {
    require(dim % m == 0, s"m $m must divide dim $dim")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val d = dim / m
    val spark = candidates.sparkSession
    val train = quantizerSample(candidates, idCol, vecCol, maxTrainRows, seed)
      .select(col("neighbor_id"),
        transform(col("cv"), x => x.cast("double")).as("v"))
      .persist()
    try {
      // effective k: never ask for more clusters than sample rows
      // (mirrors pqCodebooks' narrow-codebook behavior)
      val kEff = math.min(k.toLong, train.count()).toInt
      import scala.math.Ordering.Implicits.seqOrdering
      val centroids: Seq[(Int, Int, Seq[Double])] =
        (0 until m).flatMap { s =>
          val sub = train.select(array_to_vector(
            slice(col("v"), s * d + 1, d)).as("features"))
          val model = new KMeans().setK(kEff).setSeed(seed + s)
            .setFeaturesCol("features").setMaxIter(maxIter).fit(sub)
          model.clusterCenters.map(_.toArray.toSeq).sorted
            .zipWithIndex.map { case (c, code) => (s, code, c) }
        }
      spark.createDataFrame(centroids).toDF("sub", "code", "centroid")
    } finally train.unpersist()
  }

  /** [[pqEncode]] + [[graft.functions.PqCodes.pq_pack]]: the storage
    * form — `(id, codes_bin: binary)`, 4-bit nibbles when `k ≤ 16`,
    * bytes when `k ≤ 256`. This is what an index actually persists:
    * dim=64 float32 (256 B) → 4 B at m=8/k=16. The unpacked
    * `array<int>` twin remains the oracle-gated one ([[pqEncodeSql]]);
    * the pack/unpack round-trip is property-tested in PqSpec.
    */
  def pqEncodePacked(
      df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, k: Int, dim: Int,
  ): DataFrame = {
    require(k <= 256, s"k $k exceeds 8-bit code range")
    val bits = if (k <= 16) 4 else 8
    pqEncode(df, idCol, vecCol, codebooks, m, dim)
      .select(col("id"),
        graft.functions.PqCodes.pq_pack(col("codes"), bits).as("codes_bin"))
  }

  /** Squared-L2 distance between two equal-length double arrays as a
    * fixed-order left fold — `0 + (a1-b1)² + (a2-b2)² + …` — so the
    * value is bit-identical to the oracle's
    * `list_reduce(list_transform(...))` rendering and argmins/rank
    * comparisons agree across engines.
    */
  private[ann] def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** DuckDB rendering of [[l2sq]] for 1-based list expressions of
    * dimension `d`.
    */
  def l2sqSql(a: String, b: String, d: Int): String =
    s"list_reduce(list_transform(range(1, ${d + 1}), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  /** PQ encode: each vector → `m` small codes (nearest centroid per
    * subspace, L2, ties to the lowest code via a struct-min). 100 TB
    * shape: subspace explode is map-only (`m` rows per vector), the
    * codebook join is a broadcast of `m·k` rows, and the argmin is a
    * map-side-combinable struct-min aggregate — one shuffle of
    * `(id, sub, best)` triples, output `m` ints per vector (a 32:1
    * memory cut at dim=64 float32 → 8 one-byte codes).
    *
    * Output: `(id, codes: array<int>[m])`, codes in subspace order.
    */
  def pqEncode(
      df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, dim: Int,
  ): DataFrame =
    pqBestPerSub(df, idCol, vecCol, codebooks, m, dim)
      .groupBy(col("id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("best")))),
        e => e.getField("best").getField("code")).as("codes"))

  /** Per-row PQ reconstruction error: `(id, errq)` with
    * `errq = Σ_s l2sq(subvec_s, centroid_{s, code_s})` folded in
    * subspace order (the same sorted-struct assembly as
    * [[pqEncode]]'s codes, so the per-id sum is a fixed IEEE op
    * sequence — engine-exact, never a partition-order double sum).
    * The number [[graft.ann.Sq.quantizerPick]]'s census folds.
    */
  def pqEncodeErr(
      df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, dim: Int,
  ): DataFrame =
    pqBestPerSub(df, idCol, vecCol, codebooks, m, dim)
      .groupBy(col("id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("sub"), col("best")))),
          e => e.getField("best").getField("dist")),
        lit(0.0), (acc, x) => acc + x).as("errq"))

  /** The shared PQ assignment body: subspace explode (map-only, `m`
    * rows per vector), broadcast codebook join, map-side-combinable
    * struct-min argmin — `(id, sub, best(dist, code))`, ties to the
    * lowest code.
    */
  private def pqBestPerSub(
      df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, dim: Int,
  ): DataFrame = {
    require(dim % m == 0, s"m $m must divide dim $dim")
    val d = dim / m
    val sub = df
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("v"))
      .select(col("id"), col("sub"),
        transform(slice(col("v"), col("sub") * d + 1, lit(d)),
          x => x.cast("double")).as("subvec"))
    sub.join(broadcast(codebooks), Seq("sub"))
      .select(col("id"), col("sub"),
        struct(l2sq(col("subvec"), col("centroid")).as("dist"),
          col("code")).as("cand"))
      .groupBy(col("id"), col("sub"))
      .agg(min(col("cand")).as("best"))
  }

  /** DETERMINISTIC production-path PQ codebooks — the
    * [[pqCodebooksRefined]] idea (per-subspace Lloyd over a bounded
    * sample) rebuilt on the [[Rvq.rvqCodebooksRefined]] discipline so
    * the refined encode HASH-GATES instead of being recall-spec'd:
    * the init is the seed-drawn [[pqCodebooks]] draw, the training
    * sample is a bounded md5 TakeOrdered, and each subspace runs
    * [[Rvq.refineStage]]'s rounds (argmin ties to the lowest code,
    * id-sorted IEEE mean fold, empty codes keep their centroid) —
    * the SAME Scala body the gated refined-RVQ twin runs, so the
    * round arithmetic is shared with its oracle renderer.
    *
    * 100 TB shape: training touches only the `maxTrainRows` sample
    * (localCheckpointed once, reused by all `m` chains); each round
    * is one broadcast argmin + one k-group mean over `maxTrainRows`
    * subvectors; per-round codebooks are localCheckpointed
    * (constant-size plan); the corpus is only ever read by the
    * downstream [[pqEncode]] pass. Output matches [[pqCodebooks]]
    * (`(sub, code, centroid)`), so every consumer — [[pqEncode]],
    * [[pqTopKWithCodebooks]], [[ivfPqTopKWithCodebooks]] — is shared
    * between the twins.
    */
  def pqCodebooksRefinedDet(
      candidates: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, dim: Int, iters: Int = 2, maxTrainRows: Int = 300,
      seed: Long = 42L,
  ): DataFrame = {
    require(dim % m == 0, s"m $m must divide dim $dim")
    require(iters >= 1, s"iters $iters must be >= 1")
    val d = dim / m
    // the training sample is BOUNDED BY CONTRACT (maxTrainRows — a
    // distributed TakeOrdered cut), so the per-subspace Lloyd loop
    // runs on the DRIVER over the collected sample — the same move as
    // [[Rvq.rvqCodebooksRefined]]: the distributed loop paid an eager
    // m·k-row checkpoint per iteration plus the exploded-sample
    // checkpoint, scheduler round-trips for microseconds of
    // arithmetic. The sample cut and the seed-codebook draw stay
    // distributed. Arithmetic replayed step for step: argmin L2²
    // ascending by code with strict-< updates (the struct-min
    // `(dist, code)` tie rule), then each `(sub, code)`'s centroid
    // becomes the IEEE left-fold mean of its members in sid order
    // (the distributed form's sort_array-by-sid saw the identical
    // order), and an emptied code keeps its previous centroid.
    val init: Array[((Int, Int), Array[Double])] =
      pqCodebooks(candidates, idCol, vecCol, m, k, dim, seed)
        .select(col("sub"), col("code"), col("centroid"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
        .sortBy(_._1)
    val sample: Array[Array[Double]] = candidates
      .select(col(idCol).as("sid"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .orderBy(md5(concat(lit(s"$seed:pql:"), col("sid").cast("string"))),
        col("sid"))
      .limit(maxTrainRows)
      .orderBy(col("sid")) // the mean folds' member order
      .select(col("__v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    var cb = init
    for (_ <- 1 to iters) {
      val bySub: Map[Int, Array[((Int, Int), Array[Double])]] =
        cb.groupBy(_._1._1)
      val assigned: Array[Array[Int]] = sample.map { v =>
        Array.tabulate(m) { sub =>
          var bestD = Double.PositiveInfinity
          var best = -1
          // init is code-ascending within each sub and the map below
          // preserves positions, so iteration order = ascending code
          bySub(sub).foreach { case ((_, c), cent) =>
            var acc = 0.0
            var i = 0
            while (i < d) {
              val diff = v(sub * d + i) - cent(i); acc += diff * diff; i += 1
            }
            if (best < 0 || acc < bestD) { bestD = acc; best = c }
          }
          best
        }
      }
      cb = cb.map { case ((sub, c), cent) =>
        val members = sample.indices.filter(mi => assigned(mi)(sub) == c)
        if (members.isEmpty) ((sub, c), cent)
        else {
          val cnt = members.size.toDouble
          ((sub, c), Array.tabulate(d) { dd =>
            members.foldLeft(0.0)((acc, mi) =>
              acc + sample(mi)(sub * d + dd)) / cnt
          })
        }
      }
    }
    val rows = cb.map { case ((sub, c), cent) =>
      org.apache.spark.sql.Row(sub, c, cent.toSeq) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sub",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("code",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true),
        nullable = true)))
    val spark = candidates.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** PQ asymmetric-distance top-k (ADC): each query precomputes its
    * `m×k` subspace distance table against the codebooks (a tiny
    * broadcast-side cross join), then every candidate's approximate
    * distance is a fixed-order fold of `m` table lookups over its
    * byte codes — no vector arithmetic per pair, which is the entire
    * point of PQ at corpus scale: the scored join touches only
    * `(id, codes)` and a per-query `m·k` double array.
    *
    * Every double (table entries, the ADC fold) is a fixed IEEE op
    * sequence, so ranks agree with the oracle exactly. Ties break to
    * the lowest neighbor id.
    *
    * Output: `(query_id, neighbor_id, rank, adc)`.
    */
  def pqTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      m: Int = 8, k: Int = 16, dim: Int = 64, seed: Long = 42L,
      excludeSelf: Boolean = true,
  ): DataFrame =
    pqTopKWithCodebooks(queries, candidates, idCol, vecCol, n,
      pqCodebooks(candidates, idCol, vecCol, m, k, dim, seed),
      m, dim, excludeSelf)

  /** [[pqTopK]] with caller-supplied codebooks — the shared ADC body
    * behind both twins: seed-drawn ([[pqCodebooks]], oracle-gated)
    * and Lloyd-refined ([[pqCodebooksRefined]], recall-spec'd).
    */
  def pqTopKWithCodebooks(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      codebooks: DataFrame, m: Int, dim: Int,
      excludeSelf: Boolean = true,
  ): DataFrame = {
    val d = dim / m
    val codes = pqEncode(candidates, idCol, vecCol, codebooks, m, dim)
      .select(col("id").as("neighbor_id"), col("codes"))
    // per-query flat distance table, entry s·k+c = l2sq(qsub_s, cent_{s,c}),
    // assembled in (sub, code) order so lookups index it directly
    val qsub = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("qv"))
      .select(col("query_id"), col("sub"),
        transform(slice(col("qv"), col("sub") * d + 1, lit(d)),
          x => x.cast("double")).as("qsubvec"))
    val dtable = qsub.join(broadcast(codebooks), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        l2sq(col("qsubvec"), col("centroid")).as("qdist"))
      .groupBy(col("query_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("qdist")))),
        e => e.getField("qdist")).as("dtable"))
    // stride from the table's own length, not the configured k: a
    // corpus smaller than k seeds yields a narrower codebook, and a
    // fixed stride would silently read the wrong subspace's entries
    val scored = codes.crossJoin(broadcast(dtable))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
        else lit(true))
      .withColumn("keff", (size(col("dtable")) / m).cast("int"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
          acc + element_at(col("dtable"),
            s * col("keff") + element_at(col("codes"), s + 1) + 1)).as("adc"))
    // bounded-heap ranking, NOT a window: each query's scored
    // partition is corpus-sized here — see [[heapRank]]
    heapRank(scored, "adc", "double", n, ascending = true)
  }

  /** DuckDB rendering of the [[pqCodebooks]] + [[pqEncode]] CTE chain
    * over `embeddings(vec_id, embedding)` restricted by `whereClause`
    * (codebooks draw from the same restricted slice). Ends with CTEs
    * `cb(sub, code, centroid)` and `codes(id, codes)` for reuse by
    * both the encode and top-k oracles.
    */
  private def pqCtesSql(
      m: Int, k: Int, dim: Int, seed: Long, whereClause: String,
      from: String = "embeddings"): String =
    s"""${pqSeedCbCtesSql(m, k, dim, seed, whereClause, from, "cb")},
       |${pqEncodeTailCtesSql(m, dim)}""".stripMargin

  /** The seed-drawn codebook CTE chain (`e`, the md5 draw, `subs`,
    * `$cbName(sub, code, centroid)`) — composed by [[pqCtesSql]]
    * (with the encode tail over it) and by [[pqRefinedCtesSql]]
    * (as the Lloyd init, under a different name).
    */
  private def pqSeedCbCtesSql(
      m: Int, k: Int, dim: Int, seed: Long, whereClause: String,
      from: String, cbName: String): String = {
    val d = dim / m
    s"""e AS (SELECT vec_id, embedding FROM $from $whereClause),
       |sample AS (SELECT vec_id AS sid, embedding AS sv FROM e
       |  ORDER BY md5('$seed:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $k),
       |seeds AS (SELECT sid, sv,
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY md5('$seed:' || CAST(sid AS VARCHAR)), sid) AS INT) - 1
       |    AS code FROM sample),
       |subs AS (SELECT unnest(range(0, $m)) AS sub),
       |$cbName AS (SELECT sub, code,
       |    list_transform(list_slice(sv, sub * $d + 1, sub * $d + $d),
       |      x -> CAST(x AS DOUBLE)) AS centroid
       |  FROM seeds, subs)""".stripMargin
  }

  /** The encode tail over existing `e`/`subs`/`cb` CTEs — `vs`,
    * `dists`, `best` (per-(id,sub) argmin, dist kept for the err
    * census), `codes`. ONE renderer for the seed-drawn and
    * Lloyd-refined chains, so the assignment/tie arithmetic cannot
    * drift between the twins.
    */
  private def pqEncodeTailCtesSql(m: Int, dim: Int): String = {
    val d = dim / m
    s"""vs AS (SELECT vec_id AS id, sub,
       |    list_transform(list_slice(embedding, sub * $d + 1, sub * $d + $d),
       |      x -> CAST(x AS DOUBLE)) AS subvec
       |  FROM e, subs),
       |dists AS (SELECT id, vs.sub, code,
       |    ${l2sqSql("subvec", "centroid", d)} AS dist
       |  FROM vs JOIN cb ON vs.sub = cb.sub),
       |best AS (SELECT id, sub, code, dist,
       |    ROW_NUMBER() OVER (PARTITION BY id, sub ORDER BY dist, code) AS rn
       |  FROM dists),
       |codes AS (SELECT id, list(code ORDER BY sub) AS codes
       |  FROM best WHERE rn = 1 GROUP BY id)""".stripMargin
  }

  /** DuckDB rendering of [[pqCodebooksRefinedDet]] + the shared
    * encode tail: the seed-drawn draw as Lloyd init (`cb0`), the
    * bounded md5 training sample, `m` per-subspace unrolled Lloyd
    * chains ([[Rvq.refineCtesSql]] — the SAME renderer the gated
    * refined-RVQ oracle runs, so the round arithmetic is shared),
    * their union as `cb`, then `vs`/`dists`/`best`/`codes` verbatim.
    * `psmp` is MATERIALIZED — it feeds every per-subspace chain and
    * would otherwise re-evaluate `m · iters` times.
    */
  private[ann] def pqRefinedCtesSql(
      m: Int, k: Int, dim: Int, iters: Int, maxTrainRows: Int, seed: Long,
      whereClause: String): String = {
    val d = dim / m
    val chains = (0 until m).map { s =>
      s"""psmp$s AS (SELECT sid, list_slice(v, ${s * d + 1}, ${s * d + d})
         |    AS v FROM psmp),
         |pcbi$s AS (SELECT code, centroid FROM cb0 WHERE sub = $s),
         |${Rvq.refineCtesSql(s"q${s}_", s"psmp$s", s"pcbi$s", iters, d)}""".stripMargin
    }.mkString(",\n")
    val union = (0 until m).map(s =>
      s"SELECT $s AS sub, code, centroid FROM cbq${s}_$iters")
      .mkString("\n  UNION ALL ")
    s"""${pqSeedCbCtesSql(m, k, dim, seed, whereClause, "embeddings", "cb0")},
       |psmp AS MATERIALIZED (SELECT vec_id AS sid,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM e
       |  ORDER BY md5('$seed:pql:' || CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT $maxTrainRows),
       |$chains,
       |cb AS ($union),
       |${pqEncodeTailCtesSql(m, dim)}""".stripMargin
  }

  /** DuckDB rendering of [[pqEncode]] flattened to one INT column per
    * subspace code (`code_0..code_{m-1}`) — flat ints hash across
    * engines without list-encoding concerns.
    */
  def pqEncodeSql(
      m: Int, k: Int, dim: Int, seed: Long, whereClause: String,
      from: String = "embeddings"): String = {
    val cols = (0 until m)
      .map(s => s"codes[${s + 1}] AS code_$s").mkString(", ")
    s"""WITH ${pqCtesSql(m, k, dim, seed, whereClause, from)}
       |SELECT id, $cols FROM codes ORDER BY id""".stripMargin
  }

  /** DuckDB rendering of [[pqEncodeErr]] over the seed-drawn chain:
    * per-id reconstruction error as a subspace-ordered fold of the
    * argmin distances (`list_reduce` over `list(dist ORDER BY sub)`
    * ≡ Spark's 0.0-seeded in-order `aggregate` — the census fold
    * pairing).
    */
  def pqEncodeErrSql(
      m: Int, k: Int, dim: Int, seed: Long, whereClause: String): String =
    s"""WITH ${pqCtesSql(m, k, dim, seed, whereClause)}
       |SELECT id, list_reduce(list(dist ORDER BY sub), (x, y) -> x + y)
       |  AS errq
       |FROM best WHERE rn = 1 GROUP BY id""".stripMargin

  /** [[pqEncodeErrSql]] over the OPQ-permuted chain
    * ([[opqPermutation]] + [[opqPermute]] + [[pqEncodeErr]] on the
    * permuted column — the permutation is orthogonal, so the
    * reconstruction error is directly comparable with the plain PQ
    * rows in [[graft.ann.Sq.quantizerPick]]'s census).
    */
  def opqEncodeErrSql(
      m: Int, k: Int, dim: Int, seed: Long, whereClause: String): String =
    s"""WITH ${opqPermuteCtesSql(m, dim, whereClause)},
       |${pqCtesSql(m, k, dim, seed, "", from = "pe")}
       |SELECT id, list_reduce(list(dist ORDER BY sub), (x, y) -> x + y)
       |  AS errq
       |FROM best WHERE rn = 1 GROUP BY id""".stripMargin

  /** [[pqEncodeErrSql]] over the Lloyd-refined chain
    * ([[pqCodebooksRefinedDet]]'s oracle twin).
    */
  def pqRefinedEncodeErrSql(
      m: Int, k: Int, dim: Int, iters: Int, maxTrainRows: Int, seed: Long,
      whereClause: String): String =
    s"""WITH ${pqRefinedCtesSql(m, k, dim, iters, maxTrainRows, seed,
        whereClause)}
       |SELECT id, list_reduce(list(dist ORDER BY sub), (x, y) -> x + y)
       |  AS errq
       |FROM best WHERE rn = 1 GROUP BY id""".stripMargin

  /** DuckDB rendering of [[pqTopK]] with queries = rows of the same
    * restricted slice matching `queryWhere` (self-search, self
    * excluded).
    */
  def pqTopKSql(
      n: Int, m: Int, k: Int, dim: Int, seed: Long,
      whereClause: String, queryWhere: String): String =
    s"""WITH ${pqCtesSql(m, k, dim, seed, whereClause)},
       |${pqTopKTailSql(n, m, dim, queryWhere)}""".stripMargin

  /** DuckDB rendering of the OPQ-permuted ADC retrieval
    * ([[opqPermutation]] + [[opqPermute]] + [[pqTopKWithCodebooks]]
    * on the permuted column — queries permute through the SAME map,
    * so ranks are the permuted-space ADC ranking): the permutation
    * CTEs feed `pe`, the standard codebook/encode chain runs over
    * it, and the shared retrieval tail scores it.
    */
  def opqTopKSql(
      n: Int, m: Int, k: Int, dim: Int, seed: Long,
      whereClause: String, queryWhere: String): String =
    s"""WITH ${opqPermuteCtesSql(m, dim, whereClause)},
       |${pqCtesSql(m, k, dim, seed, "", from = "pe")},
       |${pqTopKTailSql(n, m, dim, queryWhere)}""".stripMargin

  /** The ADC retrieval tail over existing `e`/`subs`/`cb`/`codes`
    * CTEs — ONE renderer for the plain and OPQ-permuted top-k
    * oracles.
    */
  private def pqTopKTailSql(
      n: Int, m: Int, dim: Int, queryWhere: String): String = {
    val d = dim / m
    s"""q AS (SELECT vec_id AS query_id, sub,
       |    list_transform(list_slice(embedding, sub * $d + 1, sub * $d + $d),
       |      x -> CAST(x AS DOUBLE)) AS qsubvec
       |  FROM e, subs $queryWhere),
       |dt AS (SELECT query_id, q.sub, code,
       |    ${l2sqSql("qsubvec", "centroid", d)} AS qdist
       |  FROM q JOIN cb ON q.sub = cb.sub),
       |dtable AS (SELECT query_id, list(qdist ORDER BY sub, code) AS dtable
       |  FROM dt GROUP BY query_id),
       |scored AS (SELECT query_id, id AS neighbor_id,
       |    list_reduce(list_transform(range(0, $m), s ->
       |      dtable[s * (len(dtable) // $m) + codes[s + 1] + 1]),
       |      (acc, x) -> acc + x) AS adc
       |  FROM codes, dtable WHERE id <> query_id),
       |ranked AS (SELECT query_id, neighbor_id, adc,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY adc, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, adc FROM ranked
       |WHERE rank <= $n ORDER BY query_id, rank""".stripMargin
  }

  /** Recall@n of [[pqTopK]] against the EXACT squared-L2 top-n — the
    * quality gate that makes ADC regressions (codebook seeding, table
    * stride, fold order) visible as an integer drop instead of a
    * silent ranking drift. Output: `(query_id, n_hits)` with
    * `n_hits = |PQ top-n ∩ exact top-n|`, one row per query even at
    * zero hits. All-integer output → engine-exact.
    *
    * The exact side is an all-pairs compare per query — a VERIFIER in
    * the [[bruteForceTopK]] sense: run it on bounded query sets (eval
    * probes), never corpus × corpus. Same metric as PQ scores (L2²,
    * not cosine), so the recall number reflects quantization loss
    * alone, not a metric mismatch. Ties in the exact ranking break to
    * the lowest neighbor id — the identical fixed-order IEEE fold on
    * both engines ([[l2sq]]) makes tie-breaks engine-stable.
    */
  def pqRecall(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      m: Int = 8, k: Int = 16, dim: Int = 64, seed: Long = 42L,
  ): DataFrame =
    pqRecallWithCodebooks(queries, candidates, idCol, vecCol, n,
      pqCodebooks(candidates, idCol, vecCol, m, k, dim, seed), m, dim)

  /** [[pqRecall]] with caller-supplied codebooks, so the Lloyd-refined
    * twin is measured by the identical metric and tie rules as the
    * gated seed-drawn one.
    */
  def pqRecallWithCodebooks(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      codebooks: DataFrame, m: Int, dim: Int,
  ): DataFrame = {
    val pq = pqTopKWithCodebooks(queries, candidates, idCol, vecCol, n,
      codebooks, m, dim)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("neighbor_id"))
    val exactTop = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        l2sq(col("qv"), col("cv")).as("d2"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
    pq.join(exactTop, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .orderBy(col("query_id"))
  }

  /** DuckDB rendering of [[pqRecall]] (self-search over the
    * `whereClause` slice, queries = `queryWhere` rows of it).
    */
  def pqRecallSql(
      n: Int, m: Int, k: Int, dim: Int, seed: Long,
      whereClause: String, queryWhere: String): String = {
    // the rendering splices `$whereClause AND (stripped queryWhere)`;
    // an empty clause or a non-WHERE prefix would emit malformed SQL
    // silently, so the contract is checked here rather than trusted
    require(whereClause.startsWith("WHERE "),
      s"pqRecallSql whereClause must start with 'WHERE ': '$whereClause'")
    require(queryWhere.startsWith("WHERE "),
      s"pqRecallSql queryWhere must start with 'WHERE ': '$queryWhere'")
    s"""WITH pq AS (${pqTopKSql(n, m, k, dim, seed, whereClause, queryWhere)}),
       |xq AS (SELECT vec_id AS query_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       |  FROM embeddings $whereClause AND (${queryWhere.stripPrefix("WHERE ")})),
       |xc AS (SELECT vec_id AS neighbor_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |  FROM embeddings $whereClause),
       |xr AS (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY ${l2sqSql("qv", "cv", dim)}, neighbor_id) AS rnk
       |  FROM xq JOIN xc ON query_id <> neighbor_id),
       |xt AS (SELECT query_id, neighbor_id FROM xr WHERE rnk <= $n)
       |SELECT pq.query_id,
       |  CAST(SUM(CASE WHEN xt.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       |FROM pq LEFT JOIN xt
       |  ON pq.query_id = xt.query_id AND pq.neighbor_id = xt.neighbor_id
       |GROUP BY pq.query_id ORDER BY pq.query_id""".stripMargin
  }

  /** IVF-PQ — the real FAISS-style composed index, both halves of
    * this library's ANN family in ONE scored path: the hash-cell
    * coarse quantizer ([[ivfTopKHashCells]]'s cosine cells) prunes
    * the candidate set to `nProbe` probed cells per query, and PQ
    * asymmetric distance ([[pqTopK]]'s ADC fold) scores ONLY the
    * survivors from their byte codes — per scored pair the work is
    * `m` table lookups, and per query the corpus touched is
    * `nProbe/nCells` of the code table, never the vectors.
    *
    * 100 TB shape: the corpus is touched exactly twice map-only
    * (cell assignment, PQ encode — both against broadcast
    * centroids/codebooks), then the scored join is a cell equi-join
    * of the probe list against the `(cell, id, codes)` table — the
    * bytes-not-vectors layout that makes a billion-row index a few
    * GB. No all-pairs stage exists anywhere in the plan.
    *
    * Every double is a fixed IEEE op sequence (cosine cell argmax,
    * l2sq code assignment, the ADC fold), so ranks are engine-exact;
    * ties break to the smallest cell/neighbor id throughout, the
    * family's standard rule. Output: `(query_id, neighbor_id, rank,
    * adc)`.
    */
  def ivfPqTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      nCells: Int = 16, nProbe: Int = 4,
      m: Int = 8, k: Int = 16, dim: Int = 64, seed: Long = 42L,
  ): DataFrame =
    ivfPqTopKWithCodebooks(queries, candidates, idCol, vecCol, n,
      pqCodebooks(candidates, idCol, vecCol, m, k, dim, seed),
      nCells, nProbe, m, dim)

  /** [[ivfPqTopK]] with caller-supplied PQ codebooks — the shared
    * composed-index body behind both twins: seed-drawn
    * ([[pqCodebooks]], gated as `e_ivfpq_topk`) and deterministic
    * Lloyd-refined ([[pqCodebooksRefinedDet]], gated as
    * `e_ivfpq_refined`) — a production index is coarse cells +
    * REFINED fine codes, and this is where they compose.
    */
  def ivfPqTopKWithCodebooks(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      codebooks: DataFrame, nCells: Int = 16, nProbe: Int = 4,
      m: Int = 8, dim: Int = 64,
  ): DataFrame = {
    val d = dim / m
    require(dim % m == 0, s"m $m must divide dim $dim")
    // hash-picked centroids with norms, one broadcast row (the
    // ivfTopKHashCells coarse quantizer, verbatim semantics)
    val cents = candidates
      .select(col(idCol).as("cell"), col(vecCol).as("centroid"))
      .filter(norm(col("centroid")) > 0)
      .withColumn("ck", md5(col("cell").cast("string")))
      .orderBy(col("ck"), col("cell")).limit(nCells)
      .agg(collect_list(struct(col("cell"), col("centroid"),
        norm(col("centroid")).as("cnorm"))).as("cents"))
    def cellScores(vec: Column, vnorm: Column): Column =
      transform(col("cents"), ct =>
        struct((dot(vec, ct("centroid")) / (vnorm * ct("cnorm"))).as("cos"),
          (-ct("cell")).as("negcell"), ct("cell").as("cell")))

    val assigned = candidates
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm(col(vecCol)).as("cn"))
      .filter(col("cn") > 0)
      .crossJoin(broadcast(cents))
      .withColumn("cell", array_max(cellScores(col("cv"), col("cn")))("cell"))
      .select(col("neighbor_id"), col("cell"))

    val cellCodes = pqEncode(candidates, idCol, vecCol, codebooks, m, dim)
      .select(col("id").as("neighbor_id"), col("codes"))
      .join(assigned, Seq("neighbor_id"))

    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn"))
      .filter(col("qn") > 0)
      .crossJoin(broadcast(cents))
      .withColumn("scores", array_sort(cellScores(col("qv"), col("qn"))))
      .filter(size(col("scores")) > 0)
      .withColumn("np", least(lit(nProbe), size(col("scores"))))
      .withColumn("probe", explode(slice(col("scores"), -col("np"), col("np"))))
      .select(col("query_id"), col("probe.cell").as("cell"))

    // per-query flat ADC table (the pqTopK body, verbatim semantics)
    val qsub = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("qv"))
      .select(col("query_id"), col("sub"),
        transform(slice(col("qv"), col("sub") * d + 1, lit(d)),
          x => x.cast("double")).as("qsubvec"))
    val dtable = qsub.join(broadcast(codebooks), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        l2sq(col("qsubvec"), col("centroid")).as("qdist"))
      .groupBy(col("query_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("qdist")))),
        e => e.getField("qdist")).as("dtable"))

    val scored = probes.join(broadcast(dtable), Seq("query_id"))
      .join(cellCodes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("keff", (size(col("dtable")) / m).cast("int"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
          acc + element_at(col("dtable"),
            s * col("keff") + element_at(col("codes"), s + 1) + 1)).as("adc"))
    // bounded-heap ranking, NOT a window: each query's scored
    // partition is its probed corpus slice — see [[heapRank]]
    heapRank(scored, "adc", "double", n, ascending = true)
  }

  /** DuckDB rendering of [[ivfPqTopK]] (self-search: corpus =
    * `whereClause` slice of `embeddings`, queries = its `queryWhere`
    * rows).
    */
  def ivfPqTopKSql(
      n: Int, nCells: Int, nProbe: Int, m: Int, k: Int, dim: Int, seed: Long,
      whereClause: String, queryWhere: String): String = {
    require(whereClause.startsWith("WHERE "),
      s"ivfPqTopKSql whereClause must start with 'WHERE ': '$whereClause'")
    require(queryWhere.startsWith("WHERE "),
      s"ivfPqTopKSql queryWhere must start with 'WHERE ': '$queryWhere'")
    s"""WITH ${pqCtesSql(m, k, dim, seed, whereClause)},
       |${ivfPqTailSql(n, nCells, nProbe, m, dim, queryWhere)}""".stripMargin
  }

  /** DuckDB rendering of the REFINED composed index
    * ([[pqCodebooksRefinedDet]] + [[ivfPqTopKWithCodebooks]]): the
    * per-subspace unrolled-Lloyd chain builds `cb`, then the
    * identical coarse-cell + ADC tail as [[ivfPqTopKSql]] — one
    * shared renderer each side of the codebooks, so only the
    * codebooks differ between the twins.
    */
  def ivfPqRefinedTopKSql(
      n: Int, nCells: Int, nProbe: Int, m: Int, k: Int, iters: Int,
      maxTrainRows: Int, dim: Int, seed: Long,
      whereClause: String, queryWhere: String): String = {
    require(whereClause.startsWith("WHERE "),
      s"ivfPqRefinedTopKSql whereClause must start with 'WHERE ': '$whereClause'")
    require(queryWhere.startsWith("WHERE "),
      s"ivfPqRefinedTopKSql queryWhere must start with 'WHERE ': '$queryWhere'")
    s"""WITH ${pqRefinedCtesSql(m, k, dim, iters, maxTrainRows, seed,
        whereClause)},
       |${ivfPqTailSql(n, nCells, nProbe, m, dim, queryWhere)}""".stripMargin
  }

  /** The coarse-cell + ADC retrieval tail over existing
    * `e`/`subs`/`cb`/`codes` CTEs — ONE renderer for the seed-drawn
    * and refined composed-index oracles.
    */
  private def ivfPqTailSql(
      n: Int, nCells: Int, nProbe: Int, m: Int, dim: Int,
      queryWhere: String): String = {
    val d = dim / m
    val nz = s"${dotSql("embedding", "embedding", dim)} > 0"
    s"""cents AS (SELECT vec_id AS cell, embedding AS centroid
       |  FROM e WHERE $nz
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells),
       |assign0 AS (SELECT ee.vec_id AS neighbor_id, c.cell,
       |    row_number() OVER (PARTITION BY ee.vec_id
       |      ORDER BY ${cosineSql("ee.embedding", "c.centroid", dim)} DESC, c.cell) AS rn
       |  FROM (SELECT * FROM e WHERE $nz) ee CROSS JOIN cents c),
       |assigned AS (SELECT neighbor_id, cell FROM assign0 WHERE rn = 1),
       |ccodes AS (SELECT codes.id AS neighbor_id, codes.codes, a.cell
       |  FROM codes JOIN assigned a ON codes.id = a.neighbor_id),
       |probe0 AS (SELECT qq.vec_id AS query_id, c.cell,
       |    row_number() OVER (PARTITION BY qq.vec_id
       |      ORDER BY ${cosineSql("qq.embedding", "c.centroid", dim)} DESC, c.cell) AS rn
       |  FROM (SELECT * FROM e
       |    WHERE (${queryWhere.stripPrefix("WHERE ")}) AND $nz
       |    ) qq CROSS JOIN cents c),
       |probes AS (SELECT query_id, cell FROM probe0 WHERE rn <= $nProbe),
       |q AS (SELECT vec_id AS query_id, sub,
       |    list_transform(list_slice(embedding, sub * $d + 1, sub * $d + $d),
       |      x -> CAST(x AS DOUBLE)) AS qsubvec
       |  FROM e, subs $queryWhere),
       |dt AS (SELECT query_id, q.sub, code,
       |    ${l2sqSql("qsubvec", "centroid", d)} AS qdist
       |  FROM q JOIN cb ON q.sub = cb.sub),
       |dtable AS (SELECT query_id, list(qdist ORDER BY sub, code) AS dtable
       |  FROM dt GROUP BY query_id),
       |scored AS (SELECT p.query_id, cc.neighbor_id,
       |    list_reduce(list_transform(range(0, $m), s ->
       |      dtable[s * (len(dtable) // $m) + codes[s + 1] + 1]),
       |      (acc, x) -> acc + x) AS adc
       |  FROM probes p
       |  JOIN dtable ON p.query_id = dtable.query_id
       |  JOIN ccodes cc ON cc.cell = p.cell
       |  WHERE cc.neighbor_id <> p.query_id),
       |ranked AS (SELECT query_id, neighbor_id, adc,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY adc, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, adc FROM ranked
       |WHERE rank <= $n ORDER BY query_id, rank""".stripMargin
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` among
    * `df` (exact, all-pairs — O(n²); the baseline/verifier for
    * [[cosineNearDupLsh]], and usable directly on small or
    * pre-bucketed slices).
    *
    * Zero-norm vectors are excluded BEFORE scoring: cosine against a
    * zero vector is 0/0, which Spark evaluates to NaN — and Spark
    * orders NaN above every double (NaN >= threshold is TRUE) while
    * SQL engines yield NULL, so an unguarded zero vector would emit
    * engine-divergent phantom pairs. A zero embedding is never a
    * meaningful near-duplicate of anything; dropping it is the only
    * cross-engine-stable semantics.
    *
    * `maxRows` guards the quadratic blow-up: the plan RAISES (inside
    * the executors, before any pair is scored) if the scorable input
    * exceeds the bound, instead of silently launching an n²-compare
    * cartesian that would never finish at corpus scale. The guard is
    * part of the plan — a 1-row count aggregate broadcast onto the
    * left side — so it needs no driver-side count() action and costs
    * one extra linear pass, noise next to the O(n²) it bounds. Raise
    * the bound explicitly (or pass `Long.MaxValue`) only for inputs
    * you have already bucketed; the scale path is [[cosineNearDupLsh]].
    */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      maxRows: Long = 100000L,
  ): DataFrame = {
    val a0 = df.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na")).filter(col("na") > 0)
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb")).filter(col("nb") > 0)
    // guard column evaluates lazily per-row: the raise_error branch
    // only fires when the broadcast count exceeds the bound
    val cnt = df.select(col(idCol), norm(col(vecCol)).as("__na"))
      .filter(col("__na") > 0).agg(count(lit(1)).as("__n"))
    val a = a0.crossJoin(broadcast(cnt))
      .filter(when(col("__n") <= maxRows, lit(true))
        .otherwise(raise_error(concat(
          lit("cosineNearDupPairs: "), col("__n").cast("string"),
          lit(s" scorable rows exceed maxRows=$maxRows — all-pairs cosine is O(n²); " +
            "use cosineNearDupLsh for corpus-scale near-dup or raise maxRows explicitly")))))
      .drop("__n")
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Scale path for cosine near-dup: bucket each vector under `bands`
    * independent [[lshBandKeys]] keys of `r = planes/bands` bits; a
    * pair becomes a candidate iff some band key matches
    * (OR-amplified LSH, same shape as MinHash banding); candidates are
    * verified by *exact* cosine ≥ threshold — so precision is exact
    * and only recall is approximate. Candidate-match probability per
    * pair is 1-(1-p^r)^bands with p = 1 - θ/π: the r=12, bands=16
    * near-dup configuration (planes=192) recalls ≈ 0.93 at cos 0.9
    * and ≈ 1 above 0.99 while its 4096-bucket band keys pass only
    * ~bands/2^12 ≈ 0.4% of chance pairs — the property that keeps the
    * verify stage linear-ish at corpus scale. Low thresholds need
    * small r (r=3, bands=16 recalls ≈ 0.98 at cos 0.3) but are
    * inherently close to all-pairs: 8-bucket keys pass ≥ bands/2^3 of
    * ALL pairs, so treat low-threshold banding as a demo regime, not
    * a scale path.
    *
    * `dim` must equal the embedding width (mismatches raise, see
    * [[lshBandKeys]]). The signature frame is persisted internally by
    * default (every lineage use — both self-join sides and the census
    * — reads one materialized pass; see [[cosineLshCandidates]]); set
    * `persistSignatures = false` when the caller has already
    * persisted the input, to avoid caching the data twice.
    * Zero-norm vectors are excluded before scoring (same
    * cross-engine NaN-vs-NULL rationale as [[cosineNearDupPairs]] —
    * and a zero vector's LSH keys are degenerate anyway: every
    * projection is 0, so it lands in the all-zeros bucket).
    *
    * Deterministic and SQL-expressible ([[cosineNearDupLshSql]]).
    */
  def cosineNearDupLsh(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      planes: Int = 192, bands: Int = 16, dim: Int = 64,
      maxBucketSize: Int = 1000, persistSignatures: Boolean = true,
  ): DataFrame =
    cosineLshCandidates(df, idCol, vecCol, planes, bands, dim, maxBucketSize,
      persistSignatures)
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("id_a"), col("id_b"),
        cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)

  /** The deduped candidate pairs behind [[cosineNearDupLsh]] —
    * `(id_a, id_b, va, vb, na, nb)`, hot buckets dropped via the same
    * broadcast-anti-join census as [[graft.dedup.Dedup.minhashLshPairs]]
    * when `maxBucketSize > 0`. Package-visible so specs can measure
    * candidate volume directly.
    *
    * The signature frame is persisted (MEMORY_AND_DISK) by default:
    * it is read by BOTH sides of the candidate self-join plus the
    * census, and — less obviously — without the cache barrier
    * Catalyst's infer-filters-from-Generate rewrite pushes
    * `isnotnull(keys) AND size(keys) > 0` predicates BELOW the
    * posexplode, duplicating the full `planes`-projection signature
    * (and the caller's upstream lineage) several times per join side
    * inside a Filter. One materialized pass is the plan a 1000-node
    * cluster wants anyway: compute each signature once, read it
    * everywhere. The cache entry lives until the session drops it
    * (`spark.catalog.clearCache()` / `unpersist`); Spark's
    * CacheManager dedupes repeat calls over the same input plan.
    * `persistSignatures = false` skips the cache for callers who have
    * persisted upstream themselves (they still get correct results —
    * at the cost of the duplicated-lineage plan described above
    * running against their cache).
    */
  private[graft] def cosineLshCandidates(
      df: DataFrame, idCol: String, vecCol: String,
      planes: Int, bands: Int, dim: Int, maxBucketSize: Int,
      persistSignatures: Boolean = true,
  ): DataFrame = {
    require(planes % bands == 0, "bands must divide planes")
    val r = planes / bands
    val sig0 = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("vn"),
      lshBandKeys(col(vecCol), bands, r, dim).as("keys"))
    val sig =
      if (persistSignatures)
        sig0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else sig0
    // PAYLOAD-FREE buckets (the r20 lshTopK lesson, applied to the
    // banded self-join): the posexplode multiplies rows by `bands`,
    // so the dim-wide vector must not ride through the bucket
    // shuffle — ids and band keys pair up first, and the deduped
    // candidate set joins the persisted signature frame back once
    // per side (two id-equi-joins at candidate volume, noise next to
    // shuffling the payload `bands` times on both self-join sides)
    val buckets = sig.select(col("id"),
      posexplode(col("keys")).as(Seq("band", "bkey")))
    val bounded =
      if (maxBucketSize <= 0) buckets
      else {
        val hot = buckets.groupBy(col("band"), col("bkey"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > maxBucketSize)
          .select(col("band"), col("bkey"))
        buckets.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
      }
    // the bucket frame reaches this self-join with no shuffle since
    // the scan (map-only sign + posexplode), so the planner's size
    // estimate is the compressed parquet bytes — the decompressed
    // ×bands bucket rows can slip beneath the auto-broadcast
    // threshold while being orders bigger (the scan+explode class,
    // cf. Substr anchors). Both sides are the same corpus-scale
    // frame; pin sort-merge
    val pairs = bounded.as("a")
      .join(bounded.as("b").hint("merge"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(sig.select(col("id").as("id_a"), col("v").as("va"),
        col("vn").as("na")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("v").as("vb"),
        col("vn").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("va"), col("vb"),
        col("na"), col("nb"))
  }

  /** DuckDB rendering of [[cosineNearDupLsh]] (census off — the
    * oracle models the exact candidate construction). The source
    * relation defaults to `embeddings(vec_id, embedding)` restricted
    * by `whereClause`; pass `sourceSql` (any query producing
    * `(id, v)`) to run over a derived corpus instead.
    */
  def cosineNearDupLshSql(
      threshold: Double, planes: Int = 192, bands: Int = 16,
      dim: Int = 64, whereClause: String = "",
      sourceSql: Option[String] = None,
  ): String = {
    require(planes % bands == 0, "bands must divide planes")
    val r = planes / bands
    val src = sourceSql.getOrElse(
      s"SELECT vec_id AS id, embedding AS v FROM embeddings $whereClause")
    val bandSelects = (0 until bands).map { b =>
      s"SELECT id, v, $b AS band, ${lshBandKeySql("v", b, r, dim)} AS bkey FROM e"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS ($src),
       |buckets AS (
       |$bandSelects),
       |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM buckets a JOIN buckets b
       |  ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id)
       |SELECT id_a, id_b, ${cosineSql("ea.v", "eb.v", dim)} AS cos_sim
       |FROM pairs JOIN e ea ON id_a = ea.id JOIN e eb ON id_b = eb.id
       |WHERE ${dotSql("ea.v", "ea.v", dim)} > 0 AND ${dotSql("eb.v", "eb.v", dim)} > 0
       |  AND ${cosineSql("ea.v", "eb.v", dim)} >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Recall@n of any approximate ANN result against the EXACT cosine
    * top-n ([[bruteForceTopK]]) — the quality gate for the probe/band
    * knobs: a band-width or probe-count regression shows up as a
    * dropped per-query integer instead of a silent ranking drift.
    * `approx` is any frame with `(query_id, neighbor_id)` (extra
    * columns ignored). Output `(query_id, n_hits)`, all-integer →
    * engine-exact. The exact side is an all-pairs VERIFIER — run on
    * bounded query sets, never corpus × corpus.
    */
  def annRecall(
      approx: DataFrame, queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
  ): DataFrame = {
    val exact = bruteForceTopK(queries, candidates, idCol, vecCol, n)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
    // report over the FULL (nonzero-norm) query set: a query whose
    // probe buckets came up empty has recall ZERO — dropping its row
    // would overstate the index (21-of-25 rows once hid 4 dead
    // queries behind a healthy-looking average)
    queries.select(col(idCol).as("query_id"), norm(col(vecCol)).as("__qn"))
      .filter(col("__qn") > 0).select(col("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .orderBy(col("query_id"))
  }

  /** DuckDB rendering of [[annRecall]]: `approxSql` produces the
    * approximate `(query_id, neighbor_id, ...)` rows (e.g.
    * [[lshTopKSql]] / [[ivfTopKHashCellsSql]]); the exact side is the
    * cosine top-n over `embeddings` with queries restricted by
    * `queryWhere`.
    */
  def annRecallSql(
      approxSql: String, queryWhere: String, n: Int, dim: Int = 64,
      candWhere: String = "TRUE",
  ): String = {
    val nz = s"${dotSql("embedding", "embedding", dim)} > 0"
    s"""WITH ap AS ($approxSql),
       |xq AS (SELECT vec_id AS query_id, embedding AS qv
       |  FROM embeddings WHERE ($queryWhere) AND $nz),
       |xc AS (SELECT vec_id AS neighbor_id, embedding AS cv
       |  FROM embeddings WHERE ($candWhere) AND $nz),
       |xr AS (SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY ${cosineSql("qv", "cv", dim)} DESC, neighbor_id) AS rnk
       |  FROM xq JOIN xc ON query_id <> neighbor_id),
       |xt AS (SELECT query_id, neighbor_id FROM xr WHERE rnk <= $n),
       |agg AS (SELECT ap.query_id,
       |    CAST(SUM(CASE WHEN xt.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       |  FROM ap LEFT JOIN xt
       |    ON ap.query_id = xt.query_id AND ap.neighbor_id = xt.neighbor_id
       |  GROUP BY ap.query_id)
       |SELECT xq.query_id, coalesce(agg.n_hits, 0) AS n_hits
       |FROM xq LEFT JOIN agg ON xq.query_id = agg.query_id
       |ORDER BY xq.query_id""".stripMargin
  }

  /** Planted near-neighbor cohort: each selected corpus vector
    * spawns a query at `id + idOffset` whose embedding is the source
    * shifted by `delta` in every dimension — a genuine near neighbor
    * at a KNOWN, controlled distance (unit-norm corpus + delta=0.01
    * → cosine ≈ 0.997 to the source, an ~0.08 rad angle). This is
    * what makes an absolute recall number interpretable: the natural
    * corpus has no true near neighbors, so "recall vs exact top-10"
    * there mostly measures how many far-away rank-2..10 vectors a
    * bucketed index happens to share a cell with — honest but
    * unreadable without a disclaimer. Against a planted cohort the
    * question is the one an index user asks: "a near-duplicate
    * exists; does the index surface it?"
    *
    * The shift is plain double arithmetic rendered identically in
    * the DuckDB twins, so recovery gates stay value-exact.
    */
  def plantQueries(
      corpus: DataFrame, idCol: String, vecCol: String,
      idOffset: Long, delta: Double, dim: Int = 64,
  ): DataFrame =
    corpus.select((col(idCol) + idOffset).as(idCol),
      expr(s"transform(sequence(1, $dim), i -> " +
        s"CAST(element_at(`$vecCol`, i) AS DOUBLE) + CAST($delta AS DOUBLE))")
        .as(vecCol))

  /** Recovery scoreboard for a planted cohort: per planted query, did
    * `topK` surface the source vector, and at what rank. `topK` is
    * any (queries, corpus) → (query_id, neighbor_id, rank, …) search
    * ([[lshTopK]], [[ivfTopKHashCells]], …). Output: `(query_id,
    * found, rnk)` — found ∈ {0,1}, rnk null on a miss.
    */
  def plantedRecovery(
      corpus: DataFrame, idCol: String, vecCol: String,
      queryWhere: Column, idOffset: Long, delta: Double, dim: Int = 64,
  )(topK: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val planted = plantQueries(corpus.filter(queryWhere), idCol, vecCol, idOffset, delta, dim)
    val hit = topK(planted, corpus)
      .filter(col("neighbor_id") === col("query_id") - idOffset)
      .select(col("query_id"), lit(1).as("found"), col("rank").as("rnk"))
    planted.select(col(idCol).as("query_id"))
      .join(hit, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("found"), lit(0)).as("found"), col("rnk"))
      .orderBy(col("query_id"))
  }

  /** DuckDB twin of [[plantedRecovery]] over the LSH index
    * ([[lshTopK]] semantics, including probe masks and the
    * zero-norm exclusion).
    */
  def plantedRecoveryLshSql(
      queryWhere: String, idOffset: Long, delta: Double, k: Int,
      planes: Int = 12, dim: Int = 64, multiProbe: Int = 1,
  ): String = {
    val sigC = lshSignatureSql("embedding", planes, dim)
    val sigQ = lshSignatureSql("qv", planes, dim)
    val masks = probeMasks(planes, multiProbe).mkString(", ")
    s"""WITH pq AS (SELECT vec_id + $idOffset AS query_id,
       |    list_transform(range(1, ${dim + 1}), i ->
       |      CAST(embedding[i] AS DOUBLE) + CAST($delta AS DOUBLE)) AS qv
       |  FROM embeddings WHERE ($queryWhere)),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, $sigC AS bucket
       |  FROM embeddings WHERE ${dotSql("embedding", "embedding", dim)} > 0),
       |q0 AS (SELECT query_id, qv, $sigQ AS qsig
       |  FROM pq WHERE ${dotSql("qv", "qv", dim)} > 0),
       |q AS (SELECT query_id, qv, xor(qsig, m.mask) AS bucket
       |  FROM q0 CROSS JOIN (SELECT unnest([$masks]) AS mask) m),
       |scored AS (SELECT DISTINCT query_id, neighbor_id,
       |    ${cosineSql("qv", "cv", dim)} AS score
       |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS INT) AS rank
       |  FROM scored),
       |hit AS (SELECT query_id, rank AS rnk FROM ranked
       |  WHERE rank <= $k AND neighbor_id = query_id - $idOffset)
       |SELECT pq.query_id,
       |  CAST(CASE WHEN hit.query_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS found,
       |  hit.rnk AS rnk
       |FROM pq LEFT JOIN hit USING (query_id) ORDER BY pq.query_id""".stripMargin
  }

  /** DuckDB twin of [[plantedRecovery]] over the deterministic IVF
    * index ([[ivfTopKHashCells]] semantics: md5-seeded centroids,
    * argmax assignment with ties to the smallest cell id, top-nProbe
    * probes).
    */
  def plantedRecoveryIvfSql(
      queryWhere: String, idOffset: Long, delta: Double, k: Int,
      nCells: Int = 16, nProbe: Int = 4, dim: Int = 64,
  ): String = {
    val nz = s"${dotSql("embedding", "embedding", dim)} > 0"
    s"""WITH pq AS (SELECT vec_id + $idOffset AS query_id,
       |    list_transform(range(1, ${dim + 1}), i ->
       |      CAST(embedding[i] AS DOUBLE) + CAST($delta AS DOUBLE)) AS qv
       |  FROM embeddings WHERE ($queryWhere)),
       |cents AS (SELECT vec_id AS cell, embedding AS centroid
       |  FROM embeddings WHERE $nz
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells),
       |assign0 AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, c.cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosineSql("e.embedding", "c.centroid", dim)} DESC, c.cell) AS rn
       |  FROM (SELECT * FROM embeddings WHERE $nz) e CROSS JOIN cents c),
       |assigned AS (SELECT neighbor_id, cv, cell FROM assign0 WHERE rn = 1),
       |probe0 AS (SELECT q.query_id, q.qv, c.cell,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY ${cosineSql("q.qv", "c.centroid", dim)} DESC, c.cell) AS rn
       |  FROM (SELECT * FROM pq WHERE ${dotSql("qv", "qv", dim)} > 0) q
       |    CROSS JOIN cents c),
       |probes AS (SELECT query_id, qv, cell FROM probe0 WHERE rn <= $nProbe),
       |scored AS (SELECT DISTINCT query_id, neighbor_id,
       |    ${cosineSql("qv", "cv", dim)} AS score
       |  FROM probes JOIN assigned USING (cell) WHERE query_id <> neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS INT) AS rank
       |  FROM scored),
       |hit AS (SELECT query_id, rank AS rnk FROM ranked
       |  WHERE rank <= $k AND neighbor_id = query_id - $idOffset)
       |SELECT pq.query_id,
       |  CAST(CASE WHEN hit.query_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS found,
       |  hit.rnk AS rnk
       |FROM pq LEFT JOIN hit USING (query_id) ORDER BY pq.query_id""".stripMargin
  }

  /** DETERMINISTIC Lloyd-refined IVF quantizer, hash-gateable end to
    * end — the exact-value counterpart of [[ivfTopK]]'s MLlib k-means
    * (whose float reductions are engine- and partitioning-specific,
    * hence bench-only). Every step here has one bit-exact answer:
    *
    *   - init: the `nCells` sample vectors with smallest md5(id)
    *     (identical to [[ivfTopKHashCells]]'s pick);
    *   - training sample: smallest md5(seed:id), bounded by
    *     `maxTrainRows` ([[quantizerSample]] semantics) — k-means fit
    *     input stays bounded at any corpus scale;
    *   - assignment: argmax cosine, ties to the smallest cell id;
    *   - update: each centroid dimension is the SEQUENTIAL fold of
    *     its members' values in id order, divided by the member
    *     count. Summation order is pinned by sorting members, so the
    *     double result is independent of partitioning and identical
    *     in DuckDB's left-to-right `list_reduce`. Cells left empty
    *     keep their previous centroid (MLlib's rule).
    *
    * Returns the per-cell corpus assignment counts after `iters`
    * rounds — the derived integers the gate hashes. Cluster-size
    * note: the id-sorted member fold collects each cell's SAMPLE
    * members onto one row; that is safe exactly because the training
    * sample is bounded — the corpus-sized final pass is count-only.
    */
  /** The doubled corpus view the Lloyd family works over:
    * `(id, v: array<double>)`, zero-norm rows excluded.
    */
  private def lloydBase(
      corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).cast("long").as("id"),
      expr(s"transform(`$vecCol`, x -> CAST(x AS DOUBLE))").as("v"))
      .filter(dot(col("v"), col("v")) > 0) // zero-norm: see bruteForceTopK

  /** The ≤ nCells centroids as ONE broadcast array row, ZERO-NORM
    * CENTROIDS EXCLUDED: a refined centroid whose members cancel to
    * the zero vector would make every cosine against it NaN on Spark
    * (NaN ranks ABOVE every double — the [[ivfTopKHashCells]] hazard,
    * here arising from the refinement output rather than the input)
    * while SQL engines yield NULL and rank it last. Excluding the
    * degenerate cell from assignment AND probing is the rule all
    * three implementations (Spark, oracle, fuzzer reference) share.
    */
  private def lloydCentsArray(cents: DataFrame): DataFrame =
    broadcast(cents
      .filter(dot(col("centroid"), col("centroid")) > 0)
      .agg(collect_list(struct(col("cell"), col("centroid"),
        norm(col("centroid")).as("cnorm"))).as("cents")))

  /** `(cos, negcell, cell)` score structs of `(v, vn)` against the
    * broadcast `cents` array — `array_max` of these IS the argmax
    * assignment (ties to the smallest cell id via the negated middle
    * field), `array_sort` + tail slice IS probe selection. One
    * construction shared by both, so the tie-break cannot drift.
    */
  private def cellScoreStructs(v: Column, vn: Column): Column =
    transform(col("cents"), ct =>
      struct((dot(v, ct("centroid")) / (vn * ct("cnorm"))).as("cos"),
        (-ct("cell")).as("negcell"), ct("cell").as("cell")))

  /** Argmax-cosine cell assignment of `(id, v)` rows against a
    * centroid frame — map-only: the ≤ nCells centroids ride as ONE
    * broadcast array row, ties to the smallest cell id.
    */
  private def lloydAssign(rows: DataFrame, cents: DataFrame): DataFrame =
    rows.crossJoin(lloydCentsArray(cents))
      .withColumn("cell",
        array_max(cellScoreStructs(col("v"), norm(col("v"))))("cell"))
      .select(col("id"), col("v"), col("cell"))

  /** The trained `(cell, centroid)` frame after `iters` Lloyd rounds
    * — the deterministic quantizer shared by [[lloydAssignCounts]]
    * (the census gate) and [[lloydIvfTopK]] (end-to-end retrieval).
    */
  def lloydCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, iters: Int = 2, maxTrainRows: Int = 300,
      seed: Long = 42L, dim: Int = 64,
  ): DataFrame = {
    val smp = lloydBase(corpus, idCol, vecCol)
      .orderBy(md5(concat(lit(s"$seed:"), col("id").cast("string"))), col("id"))
      .limit(maxTrainRows)
    var cents = smp.withColumn("ck", md5(col("id").cast("string")))
      .orderBy(col("ck"), col("id")).limit(nCells)
      .select(col("id").as("cell"), col("v").as("centroid"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val means = lloydAssign(smp, cents).groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("id"), col("v")))).as("ms"),
          count(lit(1)).cast("double").as("cnt"))
        .select(col("cell"), expr(s"transform(sequence(1, $dim), d -> " +
          "aggregate(ms, CAST(0.0 AS DOUBLE), " +
          "(acc, m) -> acc + element_at(m.v, d)) / cnt)").as("mean"))
      cents = cents.join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("mean"), col("centroid")).as("centroid"))
        .localCheckpoint() // iterative: constant-size plan per round
    }
    cents
  }

  /** Public assignment door: `(id, v, cell)` of `corpus` against a
    * TRAINED centroid frame — map-only (the ≤ nCells centroids ride
    * as one broadcast array row). This is what writes the cell-keyed
    * store layout the incremental SemDeDup door joins, and what
    * assigns an arriving micro-batch at the stream door (stateless:
    * no aggregation, no watermark).
    */
  def lloydAssigned(corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame =
    lloydAssign(lloydBase(corpus, idCol, vecCol), cents)

  /** Over-`maxCellSize` cells of an assigned `(id, v, cell)` frame as
    * a driver-local blocklist ([[graft.ops.Skew.localBlocklist]] —
    * bounded by contract: only cells over the dial, broadcast
    * downstream anyway). Executes the census NOW (one corpus pass);
    * callers skip this entirely when the guard is disabled
    * (`Int.MaxValue`), so a streaming door never pays a store-wide
    * aggregation per micro-batch for an always-empty blocklist.
    */
  private def hotCells(assigned: DataFrame, maxCellSize: Int): DataFrame =
    graft.ops.Skew.localBlocklist(assigned
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxCellSize)
      .select(col("cell")))

  def lloydAssignCounts(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, iters: Int = 2, maxTrainRows: Int = 300,
      seed: Long = 42L, dim: Int = 64,
  ): DataFrame = {
    val cents = lloydCentroids(corpus, idCol, vecCol, nCells, iters,
      maxTrainRows, seed, dim)
    lloydAssign(lloydBase(corpus, idCol, vecCol), cents)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"))
      .select(col("cell"), col("n"))
      .orderBy(col("cell"))
  }

  /** The OPERATIONAL skew readout over the Lloyd cell census — the
    * one-row summary a SemDeDup/IVF deployment reads BEFORE running
    * the cell joins, because every within-cell cost is quadratic in
    * the largest cell: `(n_cells_used, n_rows, max_cell_n,
    * max_share_ppm, ideal_share_ppm, top_cells)`. `max_share_ppm` is
    * the largest cell's share of the corpus in ppm; `ideal_share_ppm`
    * is the balanced share (10⁶/nCells); `top_cells` the three
    * largest as `cell:n` (largest first, ties to the smaller cell
    * id).
    *
    * THE THRESHOLD RULE: raise `nCells` when `max_share_ppm` exceeds
    * ~4× `ideal_share_ppm` — a cell 4× over balance makes the
    * within-cell pair term 16× the balanced cost, and the published
    * recipe's cluster count scales with the corpus anyway (SemDeDup
    * runs ~100k clusters at web scale, never 16). If retraining at a
    * higher nCells still leaves a degenerate cell (boilerplate or
    * near-constant embeddings collapse to one point no quantizer can
    * split), THAT is the population the `maxCellSize` backstop on
    * [[semDedupPruned]] / [[semDedupPairsAgainstStore]] exists to
    * drop. All-integer output except the ppm fields, which use the
    * engine-identical `floor(x + 0.5)` device.
    */
  def lloydCellSkew(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, iters: Int = 2, maxTrainRows: Int = 300,
      seed: Long = 42L, dim: Int = 64,
  ): DataFrame = {
    val counts = lloydAssignCounts(corpus, idCol, vecCol, nCells, iters,
      maxTrainRows, seed, dim)
    counts.agg(
      count(lit(1)).cast("long").as("n_cells_used"),
      sum(col("n")).cast("long").as("n_rows"),
      max(col("n")).cast("long").as("max_cell_n"),
      // (-n, cell) struct sort = n desc, cell asc — deterministic
      // top-3 without a window
      array_join(
        transform(
          slice(array_sort(collect_list(struct(
            (-col("n")).as("negn"), col("cell").as("cell"),
            col("n").as("n")))), 1, 3),
          t => concat_ws(":", t("cell"), t("n"))),
        ",").as("top_cells"))
      .select(col("n_cells_used"), col("n_rows"), col("max_cell_n"),
        floor(col("max_cell_n") * lit(1000000.0) / col("n_rows")
          + lit(0.5)).cast("long").as("max_share_ppm"),
        lit(math.floor(1000000.0 / nCells + 0.5).toLong)
          .as("ideal_share_ppm"),
        col("top_cells"))
  }

  /** End-to-end retrieval through the DETERMINISTIC Lloyd quantizer —
    * what the bench-only MLlib [[ivfTopK]] cannot gate, this can:
    * train ([[lloydCentroids]]), assign the corpus (one map pass),
    * pick each query's `nProbe` nearest cells map-side (the
    * [[ivfTopKHashCells]] sorted-slice device, window-free), score
    * only the probed cells' members, and heap-rank the tail
    * ([[heapRank]], never a corpus window). Output:
    * `(query_id, neighbor_id, rank, score)`.
    */
  def lloydIvfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4, iters: Int = 2,
      maxTrainRows: Int = 300, seed: Long = 42L, dim: Int = 64,
  ): DataFrame = {
    val cents = lloydCentroids(corpus, idCol, vecCol, nCells, iters,
      maxTrainRows, seed, dim)
    val assigned = lloydAssign(lloydBase(corpus, idCol, vecCol), cents)
      .select(col("id").as("neighbor_id"), col("v").as("cv"),
        norm(col("v")).as("cn"), col("cell"))
    val q = lloydBase(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"),
        norm(col("v")).as("qn"))
    val probes = q.crossJoin(lloydCentsArray(cents))
      .withColumn("scores",
        array_sort(cellScoreStructs(col("qv"), col("qn"))))
      .filter(size(col("scores")) > 0)
      .withColumn("np", least(lit(nProbe), size(col("scores"))))
      .withColumn("probe", explode(slice(col("scores"), -col("np"), col("np"))))
      .select(col("query_id"), col("qv"), col("qn"), col("probe.cell").as("cell"))
    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("qn"), col("cn")).as("score"))
    heapRank(scored, "score", "double", k, ascending = false)
  }

  /** Per-id argmax-cell assignment CTE pair (`a<tag>r`, `a<tag>`) —
    * shared by the Lloyd SQL twins. Zero-norm centroids are excluded
    * (the [[lloydCentsArray]] rule: a cancelled refined centroid
    * would cosine to NaN/NULL and diverge the engines).
    */
  private def lloydAssignCtesSql(
      tag: String, rowsFrom: String, centsFrom: String, dim: Int) =
    s"""a${tag}r AS (SELECT s.id, s.v, c.cell,
       |    row_number() OVER (PARTITION BY s.id
       |      ORDER BY ${cosineSql("s.v", "c.centroid", dim)} DESC, c.cell) AS rn
       |  FROM $rowsFrom s CROSS JOIN (SELECT * FROM $centsFrom
       |    WHERE ${dotSql("centroid", "centroid", dim)} > 0) c),
       |a$tag AS (SELECT id, v, cell FROM a${tag}r WHERE rn = 1)""".stripMargin

  /** The WITH-body prefix training the Lloyd centroids: defines
    * `s0` (doubled nonzero corpus), `smp`, `c0` … `c<iters>` — the
    * trained centroid CTE is `c<iters>`. Callers splice and append.
    * `s0Body` overrides the corpus CTE body (must produce nonzero
    * `(id, v)` with `v` a DOUBLE list) — the planted-union twins ride
    * through here.
    */
  private def lloydCentroidCtesSql(
      nCells: Int, iters: Int, maxTrainRows: Int, seed: Long, dim: Int,
      s0Body: Option[String] = None,
  ): String = {
    val rounds = (1 to iters).map { r =>
      s"""${lloydAssignCtesSql(r.toString, "smp", s"c${r - 1}", dim)},
         |m$r AS (SELECT cell, list(struct_pack(id := id, v := v) ORDER BY id) AS ms,
         |    CAST(count(*) AS DOUBLE) AS cnt
         |  FROM a$r GROUP BY cell),
         |c$r AS (SELECT c.cell,
         |    -- the empty-cell fallback must test ms ITSELF: transform
         |    -- over a NULL ms yields a non-NULL list of NULLs, which
         |    -- a coalesce on the transform result would keep
         |    CASE WHEN m$r.ms IS NULL THEN c.centroid
         |    ELSE list_transform(range(1, ${dim + 1}), d ->
         |      list_reduce(list_transform(m$r.ms, m -> m.v[d]), (x, y) -> x + y) / m$r.cnt)
         |    END AS centroid
         |  FROM c${r - 1} c LEFT JOIN m$r USING (cell))""".stripMargin
    }.mkString(",\n")
    val s0 = s0Body.getOrElse(
      s"""SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings WHERE ${dotSql("embedding", "embedding", dim)} > 0""".stripMargin)
    s"""s0 AS ($s0),
       |smp AS (SELECT id, v FROM s0
       |  ORDER BY md5('$seed:' || CAST(id AS VARCHAR)), id LIMIT $maxTrainRows),
       |c0 AS (SELECT id AS cell, v AS centroid FROM smp
       |  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT $nCells),
       |$rounds""".stripMargin
  }

  /** DuckDB twin of [[lloydAssignCounts]], rounds unrolled as CTEs. */
  def lloydAssignCountsSql(
      nCells: Int = 16, iters: Int = 2, maxTrainRows: Int = 300,
      seed: Long = 42L, dim: Int = 64,
  ): String =
    s"""WITH ${lloydCentroidCtesSql(nCells, iters, maxTrainRows, seed, dim)},
       |${lloydAssignCtesSql("f", "s0", s"c$iters", dim)}
       |SELECT cell, CAST(count(*) AS BIGINT) AS n FROM af
       |GROUP BY cell ORDER BY cell""".stripMargin

  /** DuckDB twin of [[lloydCellSkew]] — the cell census folded to the
    * one-row skew summary, ppm fields via the engine-identical
    * `floor(x + 0.5)`.
    */
  def lloydCellSkewSql(
      nCells: Int = 16, iters: Int = 2, maxTrainRows: Int = 300,
      seed: Long = 42L, dim: Int = 64,
  ): String =
    s"""WITH ${lloydCentroidCtesSql(nCells, iters, maxTrainRows, seed, dim)},
       |${lloydAssignCtesSql("f", "s0", s"c$iters", dim)},
       |counts AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM af
       |  GROUP BY cell)
       |SELECT CAST(count(*) AS BIGINT) AS n_cells_used,
       |  CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(max(n) AS BIGINT) AS max_cell_n,
       |  CAST(floor(max(n) * 1000000.0 / sum(n) + 0.5) AS BIGINT)
       |    AS max_share_ppm,
       |  CAST(${math.floor(1000000.0 / nCells + 0.5).toLong} AS BIGINT)
       |    AS ideal_share_ppm,
       |  (SELECT string_agg(cell || ':' || n, ',' ORDER BY n DESC, cell)
       |   FROM (SELECT cell, n, row_number() OVER (ORDER BY n DESC, cell)
       |       AS rn FROM counts QUALIFY rn <= 3) t) AS top_cells
       |FROM counts""".stripMargin

  /** DuckDB twin of [[lloydIvfTopK]]: the trained-centroid CTEs, the
    * corpus assignment, per-query probe ranking, probed-cell scoring,
    * and the final per-query rank — queries are the `s0` rows
    * selected by `queryWhere` (over the doubled id/v view).
    */
  def lloydIvfTopKSql(
      queryWhere: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4, iters: Int = 2,
      maxTrainRows: Int = 300, seed: Long = 42L, dim: Int = 64,
  ): String =
    s"""WITH ${lloydCentroidCtesSql(nCells, iters, maxTrainRows, seed, dim)},
       |${lloydAssignCtesSql("f", "s0", s"c$iters", dim)},
       |q AS (SELECT id AS query_id, v AS qv FROM s0 WHERE $queryWhere),
       |probe0 AS (SELECT q.query_id, q.qv, c.cell,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY ${cosineSql("q.qv", "c.centroid", dim)} DESC, c.cell) AS rn
       |  FROM q CROSS JOIN (SELECT * FROM c$iters
       |    WHERE ${dotSql("centroid", "centroid", dim)} > 0) c),
       |probes AS (SELECT query_id, qv, cell FROM probe0 WHERE rn <= $nProbe),
       |scored AS (SELECT p.query_id, a.id AS neighbor_id,
       |    ${cosineSql("p.qv", "a.v", dim)} AS score
       |  FROM probes p JOIN af a USING (cell)
       |  WHERE p.query_id <> a.id)
       |SELECT query_id, neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, neighbor_id) AS INT) AS rank, score
       |FROM scored
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * semantic dedup by clustering the embedding space and pruning
    * near-identical pairs WITHIN each cluster. This is the published
    * recipe for pruning paraphrase-level duplicates that MinHash
    * can't see, at sub-quadratic cost: the all-pairs cosine is
    * confined to a cell, so the pair join is cell-keyed and the
    * quadratic term is bounded by the largest CELL, never the corpus
    * (the cell census `lloydAssignCounts` is the dial that says
    * whether nCells needs raising).
    *
    * Train = the deterministic [[lloydCentroids]] quantizer (the same
    * trainer the IVF retrieval gates pin); assignment = the same
    * map-only broadcast pass. A document is PRUNED iff some SAME-CELL
    * partner with a smaller id reaches `threshold` cosine — the
    * library's canonical min-id-survivor rule (the paper keeps one
    * arbitrary member per ε-ball; min-id makes the choice a pure
    * function of the data). Output: one row per pruned doc
    * `(id, cell, keeper_id, n_dups)` — keeper_id the smallest
    * qualifying partner, n_dups the count of qualifying lower-id
    * partners. Survivors simply don't appear (anti-join the corpus
    * against this frame to materialize the kept set).
    *
    * HOT-CELL GUARD (`maxCellSize`): the within-cell pair term is
    * quadratic in the largest cell, and real embedding corpora
    * concentrate mass (boilerplate, empty docs, near-constant vectors
    * all land in ONE cell) — a degenerate cell makes this operator
    * quadratic at exactly the corpus scale it targets. Cells over
    * `maxCellSize` are censused, the (tiny) blocklist broadcast, and
    * the assigned frame anti-joined before the self-join — docs in a
    * blocklisted cell are NOT examined and therefore SURVIVE (the
    * conservative failure: a skipped dup costs tokens, a dropped
    * survivor costs data). Unlike the band-bucket guards
    * ([[graft.dedup.Dedup.bandJoinAgainstStore]]'s 1000), the default
    * here is Int.MaxValue (guard OFF, census skipped by contract):
    * a healthy cell is corpus/nCells-sized BY CONSTRUCTION, so any
    * fixed absolute default meaningful for fine-grained LSH buckets
    * would silently blocklist the entire corpus at the default
    * nCells. Size the dial RELATIVELY — a small multiple (4–10×) of
    * n/nCells — and read the skew off [[lloydCellSkew]] first: a
    * max-cell share well above 1/nCells means raise nCells, and
    * `maxCellSize` is the backstop for the degenerate mass that
    * survives retraining.
    */
  def semDedupPruned(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nCells: Int = 16, iters: Int = 2, maxTrainRows: Int = 300,
      seed: Long = 42L, dim: Int = 64, maxCellSize: Int = Int.MaxValue,
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold $threshold must be in (0, 1]")
    val cents = lloydCentroids(corpus, idCol, vecCol, nCells, iters,
      maxTrainRows, seed, dim)
    val assigned = lloydAssign(lloydBase(corpus, idCol, vecCol), cents)
    val a0 = assigned.select(col("cell"), col("id"), col("v"),
      norm(col("v")).as("n"))
    // hot-cell guard: census -> driver-local blocklist -> broadcast
    // anti-join (the bandJoinAgainstStore shape); Int.MaxValue skips
    // the census pass by contract
    val a =
      if (maxCellSize == Int.MaxValue) a0
      else a0.join(broadcast(hotCells(assigned, maxCellSize)),
        Seq("cell"), "left_anti")
    // the assigned frame reaches this self-join map-only from the
    // scan (the scan+explode estimate class — assignment adds no
    // shuffle), and both sides are the same corpus-scale frame:
    // pin sort-merge
    a.as("x")
      .join(a.as("y").hint("merge"),
        col("x.cell") === col("y.cell") && col("y.id") < col("x.id"))
      .filter(cosinePre(col("x.v"), col("y.v"), col("x.n"), col("y.n"))
        >= threshold)
      .groupBy(col("x.id").as("id"), col("x.cell").as("cell"))
      .agg(min(col("y.id")).as("keeper_id"),
        count(lit(1)).as("n_dups"))
  }

  /** DuckDB twin of [[semDedupPruned]] over the planted-union corpus:
    * `embeddings` plus a perturbed twin (`id + idOffset`, every
    * component `+ delta`) of each row matching `plantWhere` — the
    * [[plantQueries]] device, so the gate has KNOWN semantic
    * duplicates to prune (the synthetic corpus has no organic pairs
    * above ~0.5 cosine).
    */
  def semDedupPrunedSql(
      plantWhere: String, idOffset: Long, delta: Double, threshold: Double,
      nCells: Int = 16, iters: Int = 2, maxTrainRows: Int = 300,
      seed: Long = 42L, dim: Int = 64, maxCellSize: Int = Int.MaxValue,
  ): String = {
    val s0 =
      s"""SELECT id, v FROM (
         |    SELECT vec_id AS id,
         |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |    FROM embeddings
         |    UNION ALL
         |    SELECT vec_id + $idOffset AS id,
         |      list_transform(range(1, ${dim + 1}), i ->
         |        CAST(embedding[i] AS DOUBLE) + CAST($delta AS DOUBLE)) AS v
         |    FROM embeddings WHERE ($plantWhere)) u
         |  WHERE ${dotSql("v", "v", dim)} > 0""".stripMargin
    // the hot-cell guard rendered as its own CTE pair: census,
    // blocklist, exclusion — cell counts are integers of a
    // deterministic assignment, so the guarded pair frame is
    // engine-exact. Int.MaxValue renders the unguarded text unchanged
    // (the existing e_semdedup contract); a CTE (not an inline
    // subquery) keeps DuckDB's per-reference CTE inlining from
    // cascading through the heavy assignment chain
    val (guardCtes, pairSrc) =
      if (maxCellSize == Int.MaxValue) ("", "af")
      else (
        s"""hotc AS (SELECT cell FROM af GROUP BY cell
           |  HAVING count(*) > $maxCellSize),
           |afg AS (SELECT * FROM af
           |  WHERE cell NOT IN (SELECT cell FROM hotc)),
           |""".stripMargin,
        "afg")
    s"""WITH ${lloydCentroidCtesSql(nCells, iters, maxTrainRows, seed, dim, Some(s0))},
       |${lloydAssignCtesSql("f", "s0", s"c$iters", dim)},
       |${guardCtes}pr AS (SELECT x.id, x.cell, y.id AS yid
       |  FROM $pairSrc x JOIN $pairSrc y ON x.cell = y.cell AND y.id < x.id
       |  WHERE ${cosineSql("x.v", "y.v", dim)} >= $threshold)
       |SELECT id, cell, min(yid) AS keeper_id,
       |  CAST(count(*) AS BIGINT) AS n_dups
       |FROM pr GROUP BY id, cell ORDER BY id""".stripMargin
  }

  /** Same-cell pair scan of an ASSIGNED new side against an assigned
    * store — the tail shared by the incremental SemDeDup stream door
    * ([[graft.streaming.Streams.semDedupIncrStream]]), the
    * persisted-store gate, and the spec's batch twin: one body that
    * can't drift (the `Dedup.bandJoinAgainstStore` stance). Both
    * inputs are `(id, v, cell)` frames ([[lloydAssigned]] output or
    * its reload); output `(new_id, corpus_id, score)` for every pair
    * at `threshold` cosine. The store side carries NO join-strategy
    * hint (it is O(corpus) rows) unless `broadcastStore`.
    *
    * HOT-CELL GUARD (`maxCellSize`): censused on the STORE side (the
    * side that persists and accumulates boilerplate mass; the arrival
    * side is bounded by its batch/micro-batch), the tiny blocklist
    * materialized driver-local ONCE and broadcast-anti-joined on BOTH
    * sides — byte-for-byte the
    * [[graft.dedup.Dedup.bandJoinAgainstStore]] stance, including the
    * Int.MaxValue-skips-census contract (a streaming caller would
    * otherwise re-aggregate the corpus-scale store per micro-batch
    * for an always-empty blocklist). Arrivals assigned to a
    * blocklisted cell emit NO verdict (conservative: they pass as
    * novel). Default OFF — see [[semDedupPruned]] for why an absolute
    * cap that is right for fine-grained LSH buckets is wrong as a
    * default for corpus/nCells-sized cells, and [[lloydCellSkew]] for
    * the census that sizes the dial.
    */
  def semDedupPairsAgainstStore(
      newAssigned: DataFrame, store: DataFrame, threshold: Double,
      maxCellSize: Int = Int.MaxValue,
      broadcastStore: Boolean = false): DataFrame = {
    val unguarded = maxCellSize == Int.MaxValue
    lazy val hot = hotCells(store, maxCellSize)
    def withGuard(side: DataFrame): DataFrame =
      if (unguarded) side
      else side.join(broadcast(hot), Seq("cell"), "left_anti")
    val a = withGuard(newAssigned).select(col("cell"),
      col("id").as("new_id"),
      col("v").as("nv"), norm(col("v")).as("nn"))
    val s0 = withGuard(store).select(col("cell"),
      col("id").as("corpus_id"),
      col("v").as("cv"), norm(col("v")).as("cn"))
    val s = if (broadcastStore) broadcast(s0) else s0
    a.join(s, Seq("cell"))
      .select(col("new_id"), col("corpus_id"),
        (dot(col("nv"), col("cv")) / (col("nn") * col("cn"))).as("score"))
      .filter(col("score") >= threshold)
  }

  /** DuckDB twin of the INCREMENTAL SemDeDup door
    * ([[graft.streaming.Streams.semDedupIncrStream]]): train on the
    * corpus, assign the corpus (the persisted store), assign the
    * arriving twins (`plantWhere` rows perturbed by `delta` under
    * `id + idOffset`) through the SAME argmax CTEs, and emit every
    * same-cell (arrival, store) pair at `threshold` cosine.
    */
  def semDedupIncrSql(
      plantWhere: String, idOffset: Long, delta: Double, threshold: Double,
      nCells: Int = 16, iters: Int = 2, maxTrainRows: Int = 300,
      seed: Long = 42L, dim: Int = 64,
  ): String =
    s"""WITH ${lloydCentroidCtesSql(nCells, iters, maxTrainRows, seed, dim)},
       |${lloydAssignCtesSql("f", "s0", s"c$iters", dim)},
       |tw AS (SELECT vec_id + $idOffset AS id,
       |    list_transform(range(1, ${dim + 1}), i ->
       |      CAST(embedding[i] AS DOUBLE) + CAST($delta AS DOUBLE)) AS v
       |  FROM embeddings WHERE ($plantWhere)),
       |tnz AS (SELECT id, v FROM tw WHERE ${dotSql("v", "v", dim)} > 0),
       |${lloydAssignCtesSql("n", "tnz", s"c$iters", dim)}
       |SELECT t.id AS new_id, a.id AS corpus_id,
       |  ${cosineSql("t.v", "a.v", dim)} AS score
       |FROM an t JOIN af a ON t.cell = a.cell
       |WHERE ${cosineSql("t.v", "a.v", dim)} >= $threshold
       |ORDER BY new_id, corpus_id""".stripMargin

  /** Embedding-space decontamination: corpus rows whose cosine to ANY
    * eval-set embedding reaches `threshold` — the semantic twin of the
    * shingle-overlap scan in [[graft.dedup.Dedup.contamination]],
    * catching paraphrased/re-encoded eval leakage that exact n-gram
    * overlap misses. Returns `(id, n_eval_hits, max_cos)` per
    * contaminated corpus row.
    *
    * Same banded-LSH candidate construction as [[cosineNearDupLsh]]
    * but cross-frame: both sides compute `bands` keys of `r =
    * planes/bands` sign bits; candidates share a (band, key) cell —
    * an equi-join, never all-pairs. 100 TB shape: the corpus never
    * self-joins; the eval side is tiny (benchmark suites are
    * thousands of rows, the corpus billions) so its exploded band
    * keys broadcast and the whole scan is map-side against the
    * corpus — no corpus shuffle at all. `maxBucketSize > 0` drops
    * corpus-hot cells via the same broadcast census as the dedup
    * paths; leave it 0 when (as in decontamination) false negatives
    * are the expensive mistake.
    */
  def semanticContamination(
      corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      planes: Int = 192, bands: Int = 16, dim: Int = 64,
      maxBucketSize: Int = 0,
  ): DataFrame = {
    require(planes % bands == 0, "bands must divide planes")
    val r = planes / bands
    def sides(df: DataFrame, idA: String, vA: String, nA: String) =
      df.select(col(idCol).as(idA), col(vecCol).as(vA),
        norm(col(vecCol)).as(nA),
        posexplode(lshBandKeys(col(vecCol), bands, r, dim))
          .as(Seq("band", "bkey")))
        .filter(col(nA) > 0)
    val c0 = sides(corpus, "id", "cv", "cn")
    val c =
      if (maxBucketSize <= 0) c0
      else {
        val hot = c0.groupBy(col("band"), col("bkey"))
          .agg(count(lit(1)).as("n")).filter(col("n") > maxBucketSize)
          .select(col("band"), col("bkey"))
        c0.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
      }
    val e = broadcast(sides(evalSet, "eval_id", "ev", "en"))
    c.join(e, Seq("band", "bkey"))
      .select(col("id"), col("eval_id"),
        cosinePre(col("cv"), col("ev"), col("cn"), col("en")).as("cos"))
      .dropDuplicates("id", "eval_id")
      .filter(col("cos") >= threshold)
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_eval_hits"),
        max(col("cos")).as("max_cos"))
  }

  /** DuckDB rendering of [[semanticContamination]] (census off).
    * `corpusSql` / `evalSql` each produce `(id, v)`.
    */
  def semanticContaminationSql(
      corpusSql: String, evalSql: String, threshold: Double,
      planes: Int = 192, bands: Int = 16, dim: Int = 64,
  ): String = {
    require(planes % bands == 0, "bands must divide planes")
    val r = planes / bands
    def bandedSql(rel: String) = (0 until bands).map { b =>
      s"SELECT id, v, $b AS band, ${lshBandKeySql("v", b, r, dim)} AS bkey " +
        s"FROM $rel WHERE ${dotSql("v", "v", dim)} > 0"
    }.mkString("\nUNION ALL\n")
    s"""WITH corpus AS ($corpusSql),
       |ev AS ($evalSql),
       |cb AS (
       |${bandedSql("corpus")}),
       |eb AS (
       |${bandedSql("ev")}),
       |cand AS (SELECT DISTINCT cb.id AS id, eb.id AS eval_id
       |  FROM cb JOIN eb ON cb.band = eb.band AND cb.bkey = eb.bkey),
       |hits AS (SELECT cand.id, cand.eval_id,
       |    ${cosineSql("c.v", "e.v", dim)} AS cos
       |  FROM cand JOIN corpus c ON cand.id = c.id
       |    JOIN ev e ON cand.eval_id = e.id
       |  WHERE ${cosineSql("c.v", "e.v", dim)} >= $threshold)
       |SELECT id, CAST(count(*) AS BIGINT) AS n_eval_hits,
       |  max(cos) AS max_cos
       |FROM hits GROUP BY id ORDER BY id""".stripMargin
  }

  /** DuckDB rendering of
    * [[graft.streaming.Streams.semanticContamStream]]'s AT-LEAST-ONCE
    * flag stream: one `(id, eval_id, cos)` row per COLLIDING BAND —
    * band collisions are deterministic LSH arithmetic, so the
    * multiplicity itself sits under the hash gate (the batch
    * [[semanticContaminationSql]] dedups pairs; the stream
    * deliberately does not — see the stream's scaladoc for why a
    * global pair dedup is the wrong trade there).
    */
  def semanticContamPairsSql(
      corpusSql: String, evalSql: String, threshold: Double,
      planes: Int = 192, bands: Int = 16, dim: Int = 64,
  ): String = {
    require(planes % bands == 0, "bands must divide planes")
    val r = planes / bands
    def bandedSql(rel: String) = (0 until bands).map { b =>
      s"SELECT id, v, $b AS band, ${lshBandKeySql("v", b, r, dim)} AS bkey " +
        s"FROM $rel WHERE ${dotSql("v", "v", dim)} > 0"
    }.mkString("\nUNION ALL\n")
    s"""WITH corpus AS ($corpusSql),
       |ev AS ($evalSql),
       |cb AS (
       |${bandedSql("corpus")}),
       |eb AS (
       |${bandedSql("ev")}),
       |hits AS (SELECT cb.id AS id, eb.id AS eval_id,
       |    ${cosineSql("cb.v", "eb.v", dim)} AS cos
       |  FROM cb JOIN eb ON cb.band = eb.band AND cb.bkey = eb.bkey)
       |SELECT id, eval_id, cos FROM hits WHERE cos >= $threshold
       |ORDER BY id, eval_id""".stripMargin
  }
}
