package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Residual vector quantization (RVQ) — the additive-quantizer family
  * behind modern compressed indexes and "semantic ID" generation
  * (Faiss `ResidualQuantizer`; RQ-VAE semantic IDs): a cascade of
  * FULL-dimension codebooks where stage `t` quantizes the residual
  * the first `t−1` stages left behind, so the reconstruction is the
  * SUM of one centroid per stage and the code TUPLE is a coarse-to-
  * fine address of the vector (the property semantic-ID retrieval
  * exploits: shared prefixes = semantically close).
  *
  * Contrast with PQ ([[Ann.pqEncode]]): PQ splits dimensions and
  * quantizes each slice independently (m codes, no ordering between
  * them); RVQ keeps every stage full-width and ORDERS the codes by
  * refinement. Same storage cost at equal code counts, different
  * error geometry — RVQ wins when variance is not axis-aligned.
  *
  * Codebooks here are seed-drawn, the same deliberate oracle-exactness
  * trade as [[Ann.pqCodebooks]]: stage 1's centroids are a
  * deterministic md5-keyed sample of the corpus; stage 2's centroids
  * are the stage-1 RESIDUALS of a second, differently-salted sample
  * (a fresh sample, because the stage-1 seeds' own residuals are
  * identically zero). A production deployment would Lloyd-refine each
  * stage exactly as [[Ann.pqCodebooksRefined]] does per subspace —
  * engine-specific floats, recall-spec'd rather than oracle-gated. A
  * row drawn by both samples leaves a near-zero stage-2 centroid;
  * harmless (it quantizes near-exact stage-1 matches) and documented
  * rather than special-cased.
  *
  * 100 TB shape: both codebooks are `k`-row frames (tiny at any
  * corpus size — always broadcast); the corpus is read by ONE encode
  * pass per stage — plus one full-corpus TakeOrdered per codebook
  * DRAW, whose lineage re-executes per consumer unless
  * `persistCodebooks` caches the two k-row frames (the dial the
  * seed-drawn compositions expose; a production index reads its
  * codebooks from storage instead). Each stage is a broadcast
  * nested-loop against the
  * k-row codebook followed by a map-side-combinable struct-min argmin
  * grouped on `(id, earlier codes)` — the candidate struct carries
  * `(dist, code, residual)`, so each stage's shuffle moves exactly
  * one residual array per input row (never k candidates, never the
  * raw corpus twice). Doubles are fixed-order IEEE folds
  * ([[Ann.l2sq]]) so argmins and the reported error agree with the
  * oracle exactly; ties break to the lowest code.
  */
object Rvq {

  /** Stage-1 codebook: `(code, centroid: array<double>)`, `k` rows —
    * the first `k` vectors of the `md5(seed:r1:id)`-ordered slice
    * (an unbiased deterministic sample, fetched with a distributed
    * TakeOrdered heap, never a global sort; codes re-rank only the k
    * sampled rows — bounded window).
    */
  def rvqStage1Codebook(
      candidates: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 42L,
  ): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val shuffleKey = md5(concat(lit(s"$seed:r1:"), col("sid").cast("string")))
    candidates
      .select(col(idCol).as("sid"), col(vecCol).as("sv"))
      .orderBy(shuffleKey, col("sid"))
      .limit(k)
      .withColumn("code",
        row_number().over(Window.orderBy(shuffleKey, col("sid"))) - 1)
      .select(col("code"),
        transform(col("sv"), x => x.cast("double")).as("centroid"))
  }

  /** Stage-2 codebook: the stage-1 residuals of a second seeded
    * sample (`md5(seed:r2:id)` order, first `k`), assigned against
    * `cb1` with the shared argmin. `(code, centroid)`, `≤ k` rows.
    */
  def rvqStage2Codebook(
      candidates: DataFrame, idCol: String, vecCol: String,
      cb1: DataFrame, k: Int, seed: Long = 42L,
  ): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val shuffleKey = md5(concat(lit(s"$seed:r2:"), col("sid").cast("string")))
    val sample2 = candidates
      .select(col(idCol).as("sid"), col(vecCol).as("sv"))
      .orderBy(shuffleKey, col("sid"))
      .limit(k)
      .withColumn("scode",
        row_number().over(Window.orderBy(shuffleKey, col("sid"))) - 1)
      .select(col("scode"),
        transform(col("sv"), x => x.cast("double")).as("__vec"))
    assignStage(sample2, Seq("scode"), cb1)
      .select(col("scode").as("code"), col("__res").as("centroid"))
  }

  /** Shared per-stage assignment: argmin L2² of `__vec` against the
    * broadcast codebook (ties to the lowest code), returning
    * `(groupCols…, __code, __dist, __res)` where `__res` is the
    * residual against the chosen centroid — the struct-min carries
    * `(dist, code, residual)` so the argmin, its error, and the next
    * stage's input all come out of ONE map-side-combinable aggregate.
    */
  private def assignStage(
      df: DataFrame, groupCols: Seq[String], codebook: DataFrame,
  ): DataFrame = {
    val cand = df.crossJoin(broadcast(
        codebook.select(col("code").as("__cb_code"),
          col("centroid").as("__cb_cent"))))
      .select(groupCols.map(col) :+
        struct(Ann.l2sq(col("__vec"), col("__cb_cent")).as("dist"),
          col("__cb_code").as("code"),
          zip_with(col("__vec"), col("__cb_cent"), (a, b) => a - b)
            .as("res")).as("__cand"): _*)
    cand
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("__cand")).as("__best"))
      .select(groupCols.map(col) :+
        col("__best.code").as("__code") :+
        col("__best.dist").as("__dist") :+
        col("__best.res").as("__res"): _*)
  }

  /** Two-stage RVQ encode: `(id, c1, c2, err2)` — the stage codes in
    * refinement order and the final squared-L2 reconstruction error
    * `‖v − cent1 − cent2‖²` (exactly stage 2's argmin distance; the
    * number an index sizes its stage count by). Codebooks may be
    * narrower than the configured `k` when the corpus is smaller;
    * codes stay dense in `[0, |codebook|)`.
    */
  def rvqEncode(
      df: DataFrame, idCol: String, vecCol: String,
      cb1: DataFrame, cb2: DataFrame,
  ): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("__vec"))
    val s1 = assignStage(base, Seq("id"), cb1)
      .select(col("id"), col("__code").as("c1"), col("__res").as("__vec"))
    assignStage(s1, Seq("id", "c1"), cb2)
      .select(col("id"), col("c1"), col("__code").as("c2"),
        col("__dist").as("err2"))
  }

  /** MAP-ONLY encode: the codebooks collect to the driver (bounded —
    * `k` rows each, the [[graft.ann.Ann.lshTopK]] literal-plane
    * precedent) and ship as LITERAL `k × dim` arrays inside one
    * per-row argmin fold, so encoding is a pure projection — NO
    * shuffle at all, where [[rvqEncode]] pays one `(id)`-grouped
    * struct-min shuffle per stage. Same `(dist, code)` tie rule and
    * the same IEEE [[Ann.l2sq]] fold arithmetic, so codes AND errors
    * are bit-identical to [[rvqEncode]] (spec-pinned) and the same
    * oracle gates both. This is the production INGEST shape: train
    * codebooks once, encode arrivals map-side — the body the
    * streaming door replays per micro-batch (stateless, Append mode,
    * no watermark).
    */
  def rvqEncodeMapOnly(
      df: DataFrame, idCol: String, vecCol: String,
      cb1: DataFrame, cb2: DataFrame,
  ): DataFrame = {
    def literal(cb: DataFrame): Column = array(
      cb.orderBy("code").collect()
        .map(r => array(r.getSeq[Double](1).map(lit): _*)): _*)
    val a1 = literal(cb1)
    val a2 = literal(cb2)
    def argmin(v: Column, cbArr: Column, k: Int): Column =
      aggregate(sequence(lit(0), lit(k - 1)),
        struct(lit(Double.MaxValue).as("dist"), lit(-1).as("code")),
        (acc, j) => {
          val d = Ann.l2sq(v, element_at(cbArr, j + 1))
          when(d < acc.getField("dist"),
            struct(d.as("dist"), j.as("code"))).otherwise(acc)
        })
    val k1 = cb1.count().toInt
    val k2 = cb2.count().toInt
    df.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .withColumn("__b1", argmin(col("__v"), a1, k1))
      .withColumn("__r1",
        zip_with(col("__v"),
          element_at(a1, col("__b1.code") + 1), (a, b) => a - b))
      .withColumn("__b2", argmin(col("__r1"), a2, k2))
      .select(col("id"), col("__b1.code").as("c1"),
        col("__b2.code").as("c2"), col("__b2.dist").as("err2"))
  }

  /** [[rvqEncode]] with both codebooks drawn from `candidates` — the
    * gate-facing composition. The codebook DRAWS are full-corpus
    * TakeOrdered scans whose lineage re-executes once per consumer
    * (cb1 feeds the stage-2 build and the stage-1 encode; more in
    * [[rvqTopK]]); `persistCodebooks` caches the two k-row frames
    * MEMORY_AND_DISK so each draw scans the corpus once — the
    * [[graft.text.TfIdf.topTerms]] persistInput contract (entries
    * live until the session drops them). Values are identical either
    * way; a production index persists its codebooks to storage.
    */
  def rvqEncodeSeedDrawn(
      df: DataFrame, candidates: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 42L, persistCodebooks: Boolean = false,
  ): DataFrame = {
    val (cb1, cb2) = seedDrawnCodebooks(candidates, idCol, vecCol, k, seed,
      persistCodebooks)
    rvqEncode(df, idCol, vecCol, cb1, cb2)
  }

  /** The shared seed-drawn codebook pair, optionally persisted (see
    * [[rvqEncodeSeedDrawn]]).
    */
  def seedDrawnCodebooks(
      candidates: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 42L, persistCodebooks: Boolean = false,
  ): (DataFrame, DataFrame) = {
    def hold(df: DataFrame): DataFrame =
      if (persistCodebooks)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    val cb1 = hold(rvqStage1Codebook(candidates, idCol, vecCol, k, seed))
    val cb2 = hold(rvqStage2Codebook(candidates, idCol, vecCol, cb1, k, seed))
    (cb1, cb2)
  }

  /** PRODUCTION-path RVQ codebooks: per-stage Lloyd (L2 k-means)
    * refinement of the seed-drawn draws — the additive-quantizer
    * analogue of [[Ann.pqCodebooksRefined]], but DETERMINISTIC and
    * oracle-exact like [[Ann.lloydCentroids]]: the argmin assignment
    * ties to the lowest code, the per-cell mean is a fixed-order
    * IEEE fold over members sorted by id, an emptied code keeps its
    * previous centroid, and every step is the same arithmetic the
    * unrolled-CTE oracle computes — so the refined encode hash-gates
    * where MLlib floats could only be recall-spec'd. Stage 2's init
    * residualizes against the REFINED stage 1 (refining stage 1
    * moves every stage-2 target).
    *
    * 100 TB shape: training touches only the `maxTrainRows` sample
    * (a distributed TakeOrdered heap, never a global sort); each
    * round is one broadcast argmin + one k-group mean over the
    * sample; per-round frames are localCheckpointed (constant-size
    * plan — the iterative-engine rule); the corpus is only ever read
    * by the downstream encode pass. Output matches
    * [[seedDrawnCodebooks]] (`(code, centroid)` × 2), so
    * [[rvqEncode]] / [[rvqTopKWithCodebooks]] are shared between the
    * twins.
    */
  def rvqCodebooksRefined(
      candidates: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2, maxTrainRows: Int = 300, seed: Long = 42L,
  ): (DataFrame, DataFrame) = {
    require(iters >= 1 && maxTrainRows >= k,
      s"need iters >= 1 and maxTrainRows >= k, got $iters / $maxTrainRows")
    // the training sample is BOUNDED BY CONTRACT (maxTrainRows — a
    // distributed TakeOrdered cut of the corpus), so the Lloyd loop
    // itself runs on the DRIVER over the collected sample: the
    // distributed form paid ~12 eager actions (per-iteration k-row
    // checkpoints, sample cut, dim probe — measured 46 single-task
    // scheduler jobs on e_ivfrvq_refined for ~2.5 s of task time)
    // for microseconds of arithmetic. The driver loop replays the
    // identical IEEE arithmetic (see [[refineLocal]]); the corpus-
    // scale passes — the sample cut and the two seed draws — stay
    // distributed, and the returned codebooks are k-row literal
    // frames exactly as before.
    val sample: Array[Array[Double]] = candidates
      .select(col(idCol).as("sid"),
        transform(col(vecCol), x => x.cast("double")).as("__vec"))
      .orderBy(md5(concat(lit(s"$seed:rvql:"), col("sid").cast("string"))),
        col("sid"))
      .limit(maxTrainRows)
      // re-sorted by sid so the driver-side mean folds see members in
      // the same order the distributed form's sort_array-by-sid did
      .orderBy(col("sid"))
      .select(col("__vec"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val spark = candidates.sparkSession
    val cb1Local = refineLocal(sample,
      collectCodebook(rvqStage1Codebook(candidates, idCol, vecCol, k, seed)),
      iters)
    val cb1 = literalCodebook(spark, cb1Local)
    // stage-2 inputs: the sample's residuals against REFINED stage 1
    // (residualLocal mirrors assignStage's argmin + zip_with residual)
    val r1 = sample.map(v => residualLocal(v, cb1Local))
    val cb2 = literalCodebook(spark, refineLocal(r1,
      collectCodebook(
        rvqStage2Codebook(candidates, idCol, vecCol, cb1, k, seed)),
      iters))
    (cb1, cb2)
  }

  /** Collect a bounded `(code, centroid)` codebook frame, ascending by
    * code (codes are unique; order only fixes the driver loop's
    * deterministic iteration).
    */
  private[ann] def collectCodebook(cb: DataFrame): Array[(Int, Array[Double])] =
    cb.select(col("code"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** A collected codebook back as the k-row literal frame every
    * consumer (broadcast encode joins, ADC table builds) already
    * expects — schema `(code int, centroid array<double>)`.
    */
  private[ann] def literalCodebook(
      spark: org.apache.spark.sql.SparkSession,
      cb: Array[(Int, Array[Double])]): DataFrame = {
    val rows = cb.map { case (c, cent) =>
      org.apache.spark.sql.Row(c, cent.toSeq) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("code",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true),
        nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** Driver-side argmin: L2² against each centroid ascending by code,
    * strict-< update — exactly the struct-min `(dist, code)` rule
    * (ties keep the lower code). The fold order inside l2sq matches
    * [[Ann.l2sq]]: ascending index, `acc + (x−y)·(x−y)`.
    */
  private def argminLocal(
      v: Array[Double], cb: Array[(Int, Array[Double])]): Int = {
    var bestD = Double.PositiveInfinity
    var best = -1
    cb.foreach { case (c, cent) =>
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        val d = v(i) - cent(i); acc += d * d; i += 1
      }
      if (best < 0 || acc < bestD) { bestD = acc; best = c }
    }
    best
  }

  /** Driver-side residual against the argmin centroid —
    * [[assignStage]]'s `zip_with(__vec, cent, a − b)` per element. */
  private def residualLocal(
      v: Array[Double], cb: Array[(Int, Array[Double])]): Array[Double] = {
    val cent = cb.find(_._1 == argminLocal(v, cb)).get._2
    Array.tabulate(v.length)(i => v(i) - cent(i))
  }

  /** Driver-side twin of the distributed [[refineStage]], arithmetic
    * pinned step for step: per iteration, every sample row assigns to
    * its argmin code (ties to the lowest code), then each code's
    * centroid becomes the IEEE left-fold mean of its members in sid
    * order (`sample` arrives sid-sorted; the distributed form's
    * `sort_array(collect_list(struct(sid, v)))` saw the identical
    * order), `Σ member(d)` then `/ count` — and an emptied code keeps
    * its previous centroid.
    */
  private[ann] def refineLocal(
      sample: Array[Array[Double]], cb0: Array[(Int, Array[Double])],
      iters: Int): Array[(Int, Array[Double])] = {
    var cb = cb0
    for (_ <- 1 to iters) {
      val assigned = sample.map(v => argminLocal(v, cb))
      cb = cb.map { case (c, cent) =>
        val members = sample.indices.filter(assigned(_) == c)
        if (members.isEmpty) (c, cent)
        else {
          val cnt = members.size.toDouble
          (c, Array.tabulate(cent.length) { d =>
            members.foldLeft(0.0)((acc, mi) => acc + sample(mi)(d)) / cnt
          })
        }
      }
    }
    cb
  }

  /** One stage's Lloyd rounds over a `(sid, __vec)` sample: broadcast
    * argmin (ties to the lowest code), id-sorted IEEE mean fold,
    * empty codes keep their centroid. Each round's k-row codebook is
    * eagerly localCheckpointed so the plan stays constant-size.
    */
  private[ann] def refineStage(
      smp: DataFrame, cb0: DataFrame, iters: Int, dim: Int): DataFrame = {
    var cb = cb0.localCheckpoint(true)
    for (_ <- 1 to iters) {
      val asg = smp.crossJoin(broadcast(
          cb.select(col("code").as("__cb_code"),
            col("centroid").as("__cb_cent"))))
        .select(col("sid"), col("__vec"),
          struct(Ann.l2sq(col("__vec"), col("__cb_cent")).as("dist"),
            col("__cb_code").as("code")).as("__cand"))
        .groupBy(col("sid"))
        .agg(min(col("__cand")).as("__b"), first(col("__vec")).as("__vec"))
        .select(col("sid"), col("__b.code").as("code"), col("__vec"))
      val means = asg.groupBy(col("code"))
        .agg(sort_array(collect_list(struct(col("sid"),
          col("__vec").as("v")))).as("ms"),
          count(lit(1)).cast("double").as("cnt"))
        .select(col("code"), expr(s"transform(sequence(1, $dim), d -> " +
          "aggregate(ms, CAST(0.0 AS DOUBLE), " +
          "(acc, m) -> acc + element_at(m.v, d)) / cnt)").as("mean"))
      cb = cb.join(means, Seq("code"), "left")
        .select(col("code"), coalesce(col("mean"), col("centroid"))
          .as("centroid"))
        .localCheckpoint(true)
    }
    cb
  }

  /** RVQ asymmetric-distance top-k — the retrieval side of the
    * additive quantizer. The exact expansion
    * `‖q − a − b‖² = ‖q−a‖² + (‖b‖² − 2q·b) + 2a·b` splits into a
    * per-query stage-1 table `t1[c1]`, a per-query stage-2 table
    * `t2[c2]` (k entries each), and a QUERY-INDEPENDENT cross-term
    * table `x[c1,c2]` (k² entries, computed once from the codebooks
    * and broadcast) — so scoring a candidate is three array lookups
    * and two adds over its `(c1, c2)` codes, no vector arithmetic
    * per pair (the additive-quantizer analogue of PQ's ADC, which
    * cannot drop the cross term because RVQ stages share the full
    * width). Every double is a fixed IEEE fold, added in the pinned
    * order `(t1 + t2) + x`, so ranks agree with the oracle exactly;
    * ties break to the lowest neighbor id ([[Ann.heapRank]] — the
    * bounded-heap tail, never a corpus-wide window).
    *
    * Output: `(query_id, neighbor_id, rank, adc)`.
    *
    * BOUNDED QUERY SET BY CONTRACT (the ANN family rule,
    * [[graft.ann.Ann]]): the per-query stage tables ride
    * `broadcast()`, so the query side must stay driver-broadcastable
    * — same stance as PQ's ADC tables.
    */
  def rvqTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      k: Int = 16, seed: Long = 42L, excludeSelf: Boolean = true,
      persistCodebooks: Boolean = false,
  ): DataFrame = {
    // cb1 feeds five lineages here (stage-2 build, two encode
    // stages' re-embeds, t1, the cross-term) and cb2 three — at
    // corpus scale pass persistCodebooks = true so each seed draw
    // scans the corpus once (see rvqEncodeSeedDrawn)
    val (cb1, cb2) = seedDrawnCodebooks(candidates, idCol, vecCol, k, seed,
      persistCodebooks)
    rvqTopKWithCodebooks(queries, candidates, idCol, vecCol, n, cb1, cb2,
      excludeSelf)
  }

  /** [[rvqTopK]] with caller-supplied codebooks (the persisted-index
    * deployment shape; also the shared body the refined-codebook twin
    * [[rvqCodebooksRefined]] composes with). Queries stay bounded by
    * the family contract ([[graft.ann.Ann]]) — the stage tables
    * broadcast per query set.
    */
  def rvqTopKWithCodebooks(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      cb1: DataFrame, cb2: DataFrame, excludeSelf: Boolean = true,
  ): DataFrame = {
    val codes = rvqEncode(candidates, idCol, vecCol, cb1, cb2)
      .select(col("id").as("neighbor_id"), col("c1"), col("c2"))
    val (t1, t2, xterm) = adcTables(queries, idCol, vecCol, cb1, cb2)
    val scored = codes
      .crossJoin(broadcast(t1.join(t2, Seq("query_id"))))
      .crossJoin(broadcast(xterm))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
        else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        ((element_at(col("t1"), col("c1") + 1) +
          element_at(col("t2"), col("c2") + 1)) +
          element_at(col("xflat"),
            col("c1") * size(col("t2")) + col("c2") + 1)).as("adc"))
    Ann.heapRank(scored, "adc", "double", n, ascending = true)
  }

  /** Composed IVF-RVQ (the faiss `IVF…` shape over the additive
    * quantizer — the family's third coarse-pruned index beside
    * [[graft.ann.Ann.ivfPqTopKWithCodebooks]] and
    * [[graft.ann.Sq.ivfSq8TopK]]): the md5-seeded L2 cell quantizer
    * ([[graft.ann.Sq.ivfSq8TopK]]'s coarse device — RVQ is L2
    * end-to-end, so no zero-norm exclusions anywhere, ties to the
    * smallest cell id) prunes the corpus to `nProbe` cells per
    * query, and the RVQ ADC (three broadcast lookup tables, the
    * pinned `(t1 + t2) + x` addition order) scores ONLY the
    * survivors from their `(c1, c2)` codes. Pass
    * [[rvqCodebooksRefined]]'s output for the production
    * coarse-cells + refined-fine-codes index (`e_ivfrvq_refined`);
    * with `nProbe >= nCells` the result is PROVEN identical to the
    * flat [[rvqTopKWithCodebooks]] (RvqSpec).
    *
    * 100 TB shape: the corpus is touched twice map-only (cell
    * assignment against the broadcast centroid list, the encode's
    * two struct-min stages), then the scored join is a cell
    * equi-join of the probe list against `(cell, id, c1, c2)` —
    * codes, never vectors; `nProbe/nCells` of the code table reaches
    * each query's heap.
    */
  def ivfRvqTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, n: Int,
      cb1: DataFrame, cb2: DataFrame,
      nCells: Int = 16, nProbe: Int = 4, excludeSelf: Boolean = true,
  ): DataFrame = {
    val cents = candidates
      .select(col(idCol).as("cell"),
        transform(col(vecCol), x => x.cast("double")).as("centroid"))
      .withColumn("ck", md5(col("cell").cast("string")))
      .orderBy(col("ck"), col("cell")).limit(nCells)
      .agg(collect_list(struct(col("cell"), col("centroid"))).as("cents"))
    def cellDists(vec: Column): Column =
      transform(col("cents"), ct =>
        struct(Ann.l2sq(vec, ct("centroid")).as("d"), ct("cell").as("cell")))
    val assigned = candidates
      .select(col(idCol).as("neighbor_id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("cell", array_min(cellDists(col("__v")))("cell"))
      .select(col("neighbor_id"), col("cell"))
    val cellCodes = rvqEncode(candidates, idCol, vecCol, cb1, cb2)
      .select(col("id").as("neighbor_id"), col("c1"), col("c2"))
      .join(assigned, Seq("neighbor_id"))
    val probes = queries
      .select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("ds", array_sort(cellDists(col("qv"))))
      .withColumn("np", least(lit(nProbe), size(col("ds"))))
      .withColumn("probe", explode(slice(col("ds"), lit(1), col("np"))))
      .select(col("query_id"), col("probe.cell").as("cell"))
    val (t1, t2, xterm) = adcTables(queries, idCol, vecCol, cb1, cb2)
    val scored = probes
      .join(broadcast(t1.join(t2, Seq("query_id"))), Seq("query_id"))
      .join(cellCodes, Seq("cell"))
      .crossJoin(broadcast(xterm))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
        else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        ((element_at(col("t1"), col("c1") + 1) +
          element_at(col("t2"), col("c2") + 1)) +
          element_at(col("xflat"),
            col("c1") * size(col("t2")) + col("c2") + 1)).as("adc"))
    Ann.heapRank(scored, "adc", "double", n, ascending = true)
  }

  /** The per-query ADC lookup tables — `t1(query_id, t1)`,
    * `t2(query_id, t2)`, and the 1-row query-independent cross-term
    * `xterm(xflat)` — ONE builder for the flat
    * [[rvqTopKWithCodebooks]] and the composed [[ivfRvqTopK]].
    */
  private def adcTables(
      queries: DataFrame, idCol: String, vecCol: String,
      cb1: DataFrame, cb2: DataFrame,
  ): (DataFrame, DataFrame, DataFrame) = {
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    val t1 = q.crossJoin(broadcast(cb1))
      .select(col("query_id"), col("code"),
        Ann.l2sq(col("qv"), col("centroid")).as("t"))
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("code"), col("t")))),
        e => e.getField("t")).as("t1"))
    val t2 = q.crossJoin(broadcast(cb2))
      .select(col("query_id"), col("code"),
        aggregate(zip_with(col("qv"), col("centroid"),
            (qj, cj) => cj * cj - lit(2.0) * qj * cj),
          lit(0.0), (acc, x) => acc + x).as("t"))
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("code"), col("t")))),
        e => e.getField("t")).as("t2"))
    // the k x k cross-term pairing must carry the hint: a
    // localCheckpointed codebook (the refined twin) is a LogicalRDD
    // with no size stats, and the unhinted cross join then plans the
    // shuffle-shuffle CartesianProduct instead of broadcasting k rows
    val xterm = cb1.select(col("code").as("x1"), col("centroid").as("a"))
      .crossJoin(broadcast(
        cb2.select(col("code").as("x2"), col("centroid").as("b"))))
      .select(col("x1"), col("x2"),
        aggregate(zip_with(col("a"), col("b"),
            (x, y) => lit(2.0) * x * y),
          lit(0.0), (acc, v) => acc + v).as("x"))
      .agg(transform(
        array_sort(collect_list(struct(col("x1"), col("x2"), col("x")))),
        e => e.getField("x")).as("xflat"))
    (t1, t2, xterm)
  }

  /** Shared encode CTE chain over `embeddings(vec_id, embedding)`
    * restricted by `whereClause`, ending with `e`, `cb1`, `cb2` and
    * `codes(id, c1, c2, err2)` — reused by the encode and top-k
    * oracles.
    */
  private def rvqCtesSql(
      k: Int, dim: Int, seed: Long, whereClause: String): String = {
    def residual(v: String, c: String): String =
      s"list_transform(range(1, ${dim + 1}), i -> " +
        s"CAST($v[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))"
    s"""e AS (SELECT vec_id, embedding FROM embeddings $whereClause),
       |s1 AS (SELECT vec_id AS sid, embedding AS sv FROM e
       |  ORDER BY md5('$seed:r1:' || CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT $k),
       |cb1 AS (SELECT
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY md5('$seed:r1:' || CAST(sid AS VARCHAR)), sid) AS INT)
       |      - 1 AS code,
       |    list_transform(sv, x -> CAST(x AS DOUBLE)) AS centroid
       |  FROM s1),
       |s2raw AS (SELECT vec_id AS sid, embedding AS sv FROM e
       |  ORDER BY md5('$seed:r2:' || CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT $k),
       |s2 AS (SELECT
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY md5('$seed:r2:' || CAST(sid AS VARCHAR)), sid) AS INT)
       |      - 1 AS scode,
       |    list_transform(sv, x -> CAST(x AS DOUBLE)) AS v
       |  FROM s2raw),
       |s2a AS (SELECT scode, v, centroid,
       |    ROW_NUMBER() OVER (PARTITION BY scode
       |      ORDER BY ${Ann.l2sqSql("v", "centroid", dim)}, cb1.code) AS rn
       |  FROM s2, cb1),
       |cb2 AS (SELECT scode AS code, ${residual("v", "centroid")} AS centroid
       |  FROM s2a WHERE rn = 1),
       |${encodeCtesSql("cb1", "cb2", dim)}""".stripMargin
  }

  /** The shared encode tail over `e` against codebook CTEs
    * `$cb1`/`$cb2` — ends with `codes(id, c1, c2, err2)`. ONE
    * renderer for the seed-drawn and Lloyd-refined oracles, so the
    * argmin/tie arithmetic cannot drift between the twins.
    */
  private def encodeCtesSql(cb1: String, cb2: String, dim: Int): String = {
    def residual(v: String, c: String): String =
      s"list_transform(range(1, ${dim + 1}), i -> " +
        s"CAST($v[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))"
    s"""v0 AS (SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM e),
       |a1 AS (SELECT id, v, $cb1.code AS c1, centroid,
       |    ROW_NUMBER() OVER (PARTITION BY id
       |      ORDER BY ${Ann.l2sqSql("v", "centroid", dim)}, $cb1.code) AS rn
       |  FROM v0, $cb1),
       |r1 AS (SELECT id, c1, ${residual("v", "centroid")} AS r
       |  FROM a1 WHERE rn = 1),
       |a2 AS (SELECT id, c1, $cb2.code AS c2,
       |    ${Ann.l2sqSql("r", "centroid", dim)} AS err2,
       |    ROW_NUMBER() OVER (PARTITION BY id
       |      ORDER BY ${Ann.l2sqSql("r", "centroid", dim)}, $cb2.code) AS rn
       |  FROM r1, $cb2),
       |codes AS (SELECT id, c1, c2, err2 FROM a2 WHERE rn = 1)""".stripMargin
  }

  /** One stage's unrolled Lloyd rounds (the [[refineStage]] twin)
    * over a `(sid, v)` sample CTE starting from `$cb0Cte`, emitting
    * `cb$tag$iters` — argmin ties to the lowest code, id-ordered
    * list_reduce mean (the [[Ann]] Lloyd fold pairing: Spark's 0.0
    * seed + in-order adds ≡ DuckDB's seedless list_reduce), NULL
    * member list keeps the previous centroid (tested on ms ITSELF —
    * the empty-cell lesson from the IVF oracle).
    */
  private[ann] def refineCtesSql(
      tag: String, smpCte: String, cb0Cte: String, iters: Int,
      dim: Int): String = {
    val first =
      s"""cb${tag}0 AS (SELECT code, centroid FROM $cb0Cte)""".stripMargin
    val rounds = (1 to iters).map { r =>
      val prev = s"cb$tag${r - 1}"
      s"""as$tag$r AS (SELECT sid, v, code FROM (
         |  SELECT s.sid, s.v, c.code,
         |    ROW_NUMBER() OVER (PARTITION BY s.sid
         |      ORDER BY ${Ann.l2sqSql("s.v", "c.centroid", dim)}, c.code)
         |      AS rn
         |  FROM $smpCte s, $prev c) x WHERE rn = 1),
         |m$tag$r AS (SELECT code,
         |    list(struct_pack(sid := sid, v := v) ORDER BY sid) AS ms,
         |    CAST(count(*) AS DOUBLE) AS cnt
         |  FROM as$tag$r GROUP BY code),
         |cb$tag$r AS (SELECT c.code,
         |    CASE WHEN m.ms IS NULL THEN c.centroid
         |    ELSE list_transform(range(1, ${dim + 1}), d ->
         |      list_reduce(list_transform(m.ms, m -> m.v[d]),
         |        (x, y) -> x + y) / m.cnt)
         |    END AS centroid
         |  FROM $prev c LEFT JOIN m$tag$r m USING (code))""".stripMargin
    }.mkString(",\n")
    s"$first,\n$rounds"
  }

  /** DuckDB rendering of [[rvqCodebooksRefined]] + [[rvqEncode]] over
    * `embeddings(vec_id, embedding)` restricted by `whereClause` —
    * the seed draws, the unrolled per-stage Lloyd rounds, and the
    * SHARED encode tail.
    */
  def rvqRefinedEncodeSql(
      k: Int, iters: Int, maxTrainRows: Int, dim: Int, seed: Long,
      whereClause: String): String =
    s"""WITH ${rvqRefinedCtesSql(k, iters, maxTrainRows, dim, seed,
        whereClause)}
       |SELECT id, c1, c2, err2 FROM codes""".stripMargin

  /** The refined-encode CTE chain (the `WITH` body through `codes`,
    * no final SELECT) — ONE renderer composed by both
    * [[rvqRefinedEncodeSql]] and [[rvqRefinedTopKSql]], replacing the
    * old splice-on-a-marker (`lastIndexOf` of the encode oracle's
    * final SELECT) that would throw at render time if the encode
    * output line ever changed.
    */
  private def rvqRefinedCtesSql(
      k: Int, iters: Int, maxTrainRows: Int, dim: Int, seed: Long,
      whereClause: String): String = {
    def residual(v: String, c: String): String =
      s"list_transform(range(1, ${dim + 1}), i -> " +
        s"CAST($v[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))"
    // the seed-drawn inits: reuse the draw CTEs (cb1/cb2) but note
    // cb2's init must residualize against the REFINED cb1, so the
    // draw chain is re-rendered here with cbr1$iters as the stage-2
    // assignment target
    s"""e AS (SELECT vec_id, embedding FROM embeddings $whereClause),
       |s1 AS (SELECT vec_id AS sid, embedding AS sv FROM e
       |  ORDER BY md5('$seed:r1:' || CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT $k),
       |cb1init AS (SELECT
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY md5('$seed:r1:' || CAST(sid AS VARCHAR)), sid) AS INT)
       |      - 1 AS code,
       |    list_transform(sv, x -> CAST(x AS DOUBLE)) AS centroid
       |  FROM s1),
       |smp AS (SELECT sid, v FROM (
       |    SELECT vec_id AS sid,
       |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM e) b
       |  ORDER BY md5('$seed:rvql:' || CAST(sid AS VARCHAR)), sid
       |  LIMIT $maxTrainRows),
       |${refineCtesSql("r1_", "smp", "cb1init", iters, dim)},
       |cb1 AS (SELECT code, centroid FROM cbr1_$iters),
       |s2raw AS (SELECT vec_id AS sid, embedding AS sv FROM e
       |  ORDER BY md5('$seed:r2:' || CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT $k),
       |s2 AS (SELECT
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY md5('$seed:r2:' || CAST(sid AS VARCHAR)), sid) AS INT)
       |      - 1 AS scode,
       |    list_transform(sv, x -> CAST(x AS DOUBLE)) AS v
       |  FROM s2raw),
       |s2a AS (SELECT scode, v, centroid,
       |    ROW_NUMBER() OVER (PARTITION BY scode
       |      ORDER BY ${Ann.l2sqSql("v", "centroid", dim)}, cb1.code) AS rn
       |  FROM s2, cb1),
       |cb2init AS (SELECT scode AS code, ${residual("v", "centroid")}
       |    AS centroid
       |  FROM s2a WHERE rn = 1),
       |rs AS (SELECT sid, ${residual("v", "centroid")} AS v FROM (
       |    SELECT s.sid, s.v, c.centroid,
       |      ROW_NUMBER() OVER (PARTITION BY s.sid
       |        ORDER BY ${Ann.l2sqSql("s.v", "c.centroid", dim)}, c.code)
       |        AS rn
       |    FROM smp s, cb1 c) x WHERE rn = 1),
       |${refineCtesSql("r2_", "rs", "cb2init", iters, dim)},
       |cb2 AS (SELECT code, centroid FROM cbr2_$iters),
       |${encodeCtesSql("cb1", "cb2", dim)}""".stripMargin
  }

  /** DuckDB rendering of [[rvqEncodeSeedDrawn]] over
    * `embeddings(vec_id, embedding)` restricted by `whereClause`
    * (both codebooks draw from the same restricted slice; `dim` is
    * the embedding width, needed to unroll the residual zip).
    */
  def rvqEncodeSql(
      k: Int, dim: Int, seed: Long, whereClause: String): String =
    s"""WITH ${rvqCtesSql(k, dim, seed, whereClause)}
       |SELECT id, c1, c2, err2 FROM codes""".stripMargin

  /** DuckDB rendering of [[rvqTopK]] (self-search over the
    * `whereClause` slice, queries = `queryWhere` rows of it, self
    * excluded) — same stage tables, same pinned `(t1 + t2) + x`
    * addition order.
    */
  def rvqTopKSql(
      n: Int, k: Int, dim: Int, seed: Long,
      whereClause: String, queryWhere: String): String =
    s"""WITH ${rvqCtesSql(k, dim, seed, whereClause)},
       |${topKTailSql(n, dim, queryWhere)}""".stripMargin

  /** DuckDB rendering of the refined-codebook retrieval
    * ([[rvqCodebooksRefined]] + [[rvqTopKWithCodebooks]]): the
    * refined-encode CTE chain under the SHARED ADC tail.
    */
  def rvqRefinedTopKSql(
      n: Int, k: Int, iters: Int, maxTrainRows: Int, dim: Int, seed: Long,
      whereClause: String, queryWhere: String): String =
    s"""WITH ${rvqRefinedCtesSql(k, iters, maxTrainRows, dim, seed,
        whereClause)},
       |${topKTailSql(n, dim, queryWhere)}""".stripMargin

  /** The ADC top-k tail over existing `e`/`cb1`/`cb2`/`codes` CTEs —
    * ONE renderer for the seed-drawn and refined oracles (same stage
    * tables, same pinned `(t1 + t2) + x` addition order).
    */
  private def topKTailSql(n: Int, dim: Int, queryWhere: String): String =
    s"""${adcTablesSql(dim, queryWhere)},
       |scored AS (SELECT t1g.query_id, id AS neighbor_id,
       |    (t1[c1 + 1] + t2[c2 + 1]) +
       |      xflat[c1 * len(t2) + c2 + 1] AS adc
       |  FROM codes, t1g, t2g, xt
       |  WHERE t1g.query_id = t2g.query_id AND id <> t1g.query_id),
       |${rankedTailSql(n)}""".stripMargin

  /** The per-query ADC table CTEs (`q`, `t1g`, `t2g`, `xt`) over
    * existing `e`/`cb1`/`cb2` — ONE renderer for the flat and
    * IVF-composed retrieval oracles (the [[adcTables]] twin).
    */
  private def adcTablesSql(dim: Int, queryWhere: String): String = {
    def fold(body: String): String =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $body), " +
        "(acc, x) -> acc + x)"
    s"""q AS (SELECT vec_id AS query_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       |  FROM e $queryWhere),
       |t1g AS (SELECT query_id, list(t ORDER BY code) AS t1
       |  FROM (SELECT query_id, code,
       |      ${Ann.l2sqSql("qv", "centroid", dim)} AS t FROM q, cb1)
       |  GROUP BY query_id),
       |t2g AS (SELECT query_id, list(t ORDER BY code) AS t2
       |  FROM (SELECT query_id, code,
       |      ${fold("centroid[i] * centroid[i] - 2.0 * qv[i] * centroid[i]")}
       |        AS t FROM q, cb2)
       |  GROUP BY query_id),
       |xt AS (SELECT list(x ORDER BY x1, x2) AS xflat
       |  FROM (SELECT cb1.code AS x1, cb2.code AS x2,
       |      ${fold("2.0 * cb1.centroid[i] * cb2.centroid[i]")} AS x
       |    FROM cb1, cb2))""".stripMargin
  }

  private def rankedTailSql(n: Int): String =
    s"""ranked AS (SELECT query_id, neighbor_id, adc,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY adc, neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, adc FROM ranked
       |WHERE rank <= $n ORDER BY query_id, rank""".stripMargin

  /** DuckDB rendering of the composed refined index
    * ([[rvqCodebooksRefined]] + [[ivfRvqTopK]]): the refined-encode
    * CTE chain, the md5-seeded L2 cells over `v0` (the encode
    * chain's own double-vector frame), the probe list, and the
    * shared ADC tables scoring only probed survivors.
    */
  def ivfRvqRefinedTopKSql(
      n: Int, k: Int, iters: Int, maxTrainRows: Int, dim: Int, seed: Long,
      nCells: Int, nProbe: Int,
      whereClause: String, queryWhere: String): String =
    s"""WITH ${rvqRefinedCtesSql(k, iters, maxTrainRows, dim, seed,
        whereClause)},
       |cents AS (SELECT vec_id AS cell,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
       |  FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT $nCells),
       |assign0 AS (SELECT v0.id AS neighbor_id, c.cell,
       |    row_number() OVER (PARTITION BY v0.id
       |      ORDER BY ${Ann.l2sqSql("v0.v", "c.centroid", dim)}, c.cell)
       |      AS rn
       |  FROM v0 CROSS JOIN cents c),
       |assigned AS (SELECT neighbor_id, cell FROM assign0 WHERE rn = 1),
       |ccodes AS (SELECT codes.id AS neighbor_id, c1, c2, a.cell
       |  FROM codes JOIN assigned a ON codes.id = a.neighbor_id),
       |${adcTablesSql(dim, queryWhere)},
       |probe0 AS (SELECT q.query_id, c.cell,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY ${Ann.l2sqSql("q.qv", "c.centroid", dim)}, c.cell)
       |      AS rn
       |  FROM q CROSS JOIN cents c),
       |probes AS (SELECT query_id, cell FROM probe0 WHERE rn <= $nProbe),
       |scored AS (SELECT p.query_id, cc.neighbor_id,
       |    (t1[c1 + 1] + t2[c2 + 1]) +
       |      xflat[c1 * len(t2) + c2 + 1] AS adc
       |  FROM probes p
       |  JOIN t1g ON t1g.query_id = p.query_id
       |  JOIN t2g ON t2g.query_id = p.query_id
       |  JOIN ccodes cc ON cc.cell = p.cell
       |  CROSS JOIN xt
       |  WHERE cc.neighbor_id <> p.query_id),
       |${rankedTailSql(n)}""".stripMargin
}
