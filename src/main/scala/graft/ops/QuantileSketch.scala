package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile sketch — an HDR-histogram-style
  * log-linear bucketing (Tene's HdrHistogram; the same
  * exponent+mantissa-prefix layout DDSketch reaches via float logs,
  * here in ALL-INTEGER arithmetic so every cell and every quantile
  * answer sits under the exact-value oracle gate). This is the
  * missing sketch family next to [[Hll]] (cardinality),
  * [[Sketches.kmvDistinct]] (distinct sampling) and
  * [[Sketches.cmsCells]] (frequency): rank/percentile queries from
  * bounded state.
  *
  * Bucketing for a non-negative BIGINT `v` with `m` sub-bucket bits:
  *
  *   v < 2^(m+1)          → bucket = v                     (exact)
  *   otherwise, e = bitlength(v) − 1 (MSB position):
  *                          bucket = (e − m)·2^m + (v >> (e − m))
  *
  * i.e. values keep their top `m+1` significant bits — each log
  * bucket at exponent `e` spans `2^(e−m)` consecutive integers, so
  * the relative width (and the quantile answer's relative error) is
  * ≤ 2^−m, while the whole BIGINT range needs only
  * `(63 − m)·2^m + 2^(m+1)` buckets (m = 5 → ~1.9k cells max, in
  * practice far fewer). Bit length is `length(bin(v))` — a STRING
  * length, identical in both engines (the [[Hll]] rho device), so no
  * `log2` rounding hazard enters. The bucket map is monotone, so
  * bucket order IS value order and rank queries walk the cumulative
  * cell counts.
  *
  * Why not KLL/GK: their compaction state depends on arrival order —
  * a shuffled corpus would produce a run-dependent sketch that can
  * never hash-match an oracle (and per-partition results would
  * differ run to run). The log-linear histogram is ORDER-INDEPENDENT
  * and merges by plain per-bucket count addition: shard sketches,
  * stream micro-batch sketches, and the whole-corpus sketch are the
  * SAME object, bit for bit ([[merge]]; QuantileSketchSpec pins
  * two-slice ≡ whole). The trade is a fixed relative-error grid
  * instead of KLL's rank-error guarantee — the right trade under a
  * determinism gate, and the guarantee production latency/size
  * sketches (HdrHistogram, DDSketch) actually ship with.
  *
  * 100 TB shape: the cell build is one `groupBy(bucket).count` —
  * map-side partial aggregation collapses every partition to ≤ ~2k
  * cells before the shuffle, so the exchange moves
  * O(partitions·cells) regardless of row count (the HLL register
  * argument). Quantile extraction runs on the CELL frame (window
  * over ≤ ~2k rows), never on data. Grouped variants keep ≤ ~2k
  * cells per group — bounded state per domain/source at any
  * cardinality.
  *
  * Input contract: values must already be integral. Converting a
  * DOUBLE column must use an explicit engine-identical rule —
  * `floor(x·100 + 0.5)` for cents — because a bare double→bigint
  * cast TRUNCATES in Spark and ROUNDS in DuckDB (a latent ±1 that
  * surfaces the moment a gate emits the raw value; the gated cents
  * construction does exactly this).
  *
  * Quantile targets are integer per-mille (`q_permille` ∈ [1, 1000]):
  * `rank = ceil(n·q/1000)` computed as `(n·q + 999) div 1000` — no
  * float q ever multiplies a count, so ranks are engine-exact. The
  * answer is the first bucket whose cumulative count reaches `rank`;
  * the true rank-`rank` value lies in `[est_lb, est_ub]` of that
  * bucket (bucketing is monotone), giving `est_ub/est_lb ≤ 1 + 2^−m`.
  */
object QuantileSketch {

  /** Bucket index of non-negative `v` (BIGINT) — see object scaladoc.
    * Null-safe (null in, null out); negative values raise.
    */
  def bucketOf(v: Column, m: Int): Column = {
    require(m >= 1 && m <= 16, s"m $m must be in [1, 16]")
    val exact = 1L << (m + 1)
    val e = (length(bin(v)) - 1).cast("long")
    val shift = (e - m).cast("int")
    when(v < 0, raise_error(concat(
        lit("quantile sketch requires non-negative values, got "),
        v.cast("string"))))
      .when(v < exact, v)
      .otherwise((e - m) * (1L << m) +
        call_function("shiftright", v, shift))
  }

  /** Lower bound (smallest value) of `bucket` — the quantile
    * representative. Inverse of [[bucketOf]]'s monotone map.
    */
  def lowerBound(bucket: Column, m: Int): Column = {
    val exact = 1L << (m + 1)
    val shift = (shiftright(bucket, m) - 1).cast("int")
    val sub = bucket - shift.cast("long") * (1L << m)
    when(bucket < exact, bucket)
      .otherwise(call_function("shiftleft", sub, shift))
  }

  /** Largest value of `bucket` (`lb + 2^(e−m) − 1`). */
  def upperBound(bucket: Column, m: Int): Column = {
    val exact = 1L << (m + 1)
    val shift = (shiftright(bucket, m) - 1).cast("int")
    when(bucket < exact, bucket)
      .otherwise(lowerBound(bucket, m) +
        call_function("shiftleft", lit(1L), shift) - 1)
  }

  /** The sketch: `(bucket, cnt)` cells for `valueCol` (non-negative
    * integral; nulls skipped). One map-side-combined aggregate.
    */
  def cells(df: DataFrame, valueCol: String, m: Int = 5): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(bucketOf(col(valueCol).cast("long"), m).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches from independent shards / micro-batches:
    * per-bucket count addition — associative, commutative, and
    * identical to sketching the union (QuantileSketchSpec pins it).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Per-group sketch: `(g, bucket, cnt)` — ≤ ~2k cells per group at
    * ANY group cardinality.
    */
  def cellsPerGroup(
      df: DataFrame, groupCol: String, valueCol: String, m: Int = 5): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        bucketOf(col(valueCol).cast("long"), m).as("bucket"))
      .groupBy(col("g"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile answers from a cell frame: one row per `q_permille`
    * with the total `n`, the integer target `rank`, the answering
    * `bucket` and its `[est_lb, est_ub]` envelope. Runs entirely on
    * the sketch (cumulative window over ≤ ~2k cells).
    */
  def quantiles(
      cellsDf: DataFrame, qPermille: Seq[Int], m: Int = 5): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      s"q_permille values $qPermille must be in [1, 1000]")
    val spark = cellsDf.sparkSession
    import spark.implicits._
    val cum = cellsDf.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(cellsDf.agg(sum(col("cnt")).as("n"))))
    val qs = qPermille.sorted.toDF("q_permille")
    cum.crossJoin(broadcast(qs))
      .withColumn("rank", expr("(n * q_permille + 999) div 1000"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("q_permille"), col("n"), col("rank"))
      .agg(min(col("bucket")).as("bucket"))
      .select(col("q_permille"), col("n"), col("rank"), col("bucket"),
        lowerBound(col("bucket"), m).as("est_lb"),
        upperBound(col("bucket"), m).as("est_ub"))
  }

  /** Per-group [[quantiles]] over a [[cellsPerGroup]] frame. */
  def quantilesPerGroup(
      cellsDf: DataFrame, qPermille: Seq[Int], m: Int = 5): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      s"q_permille values $qPermille must be in [1, 1000]")
    val spark = cellsDf.sparkSession
    import spark.implicits._
    val totals = cellsDf.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    val cum = cellsDf.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("g"))
        .orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(totals), Seq("g"))
    val qs = qPermille.sorted.toDF("q_permille")
    cum.crossJoin(broadcast(qs))
      .withColumn("rank", expr("(n * q_permille + 999) div 1000"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("g"), col("q_permille"), col("n"), col("rank"))
      .agg(min(col("bucket")).as("bucket"))
      .select(col("g"), col("q_permille"), col("n"), col("rank"),
        col("bucket"),
        lowerBound(col("bucket"), m).as("est_lb"),
        upperBound(col("bucket"), m).as("est_ub"))
  }

  /** Equal-frequency discretization THROUGH the sketch — the feature-
    * engineering stage quantile sketches exist to feed: bucket
    * boundaries come from the sketch's quantile answers (`est_lb` of
    * each target), ride a 1-row broadcast, and each row's `bin` is
    * the count of boundaries ≤ its value — a pure codegen'd HOF, no
    * join, no sort, no second pass over the data beyond the cell
    * census. `len(qPermille)+1` bins, bin `i` = values in
    * `[bound_i, bound_{i+1})`.
    */
  def discretize(
      df: DataFrame, idCol: String, valueCol: String,
      qPermille: Seq[Int], m: Int = 5): DataFrame = {
    val bounds = quantiles(cells(df, valueCol, m), qPermille, m)
      .agg(sort_array(collect_list(col("est_lb"))).as("__bounds"))
    df.select(col(idCol).as("id"), col(valueCol).cast("long").as("v"))
      .crossJoin(broadcast(bounds))
      .select(col("id"), col("v"),
        size(filter(col("__bounds"), b => col("v") >= b)).cast("int")
          .as("bin"))
  }

  // ---- DuckDB oracle renderings (identical integer arithmetic) ----

  /** Bucket expression for value SQL `v`. */
  def bucketSql(v: String, m: Int): String = {
    val exact = 1L << (m + 1)
    val e = s"(length(bin($v)) - 1)"
    s"CAST(CASE WHEN $v < $exact THEN $v ELSE " +
      s"($e - $m) * ${1L << m} + ($v >> ($e - $m)) END AS BIGINT)"
  }

  /** Lower-bound expression for bucket SQL `b`. */
  def lowerBoundSql(b: String, m: Int): String = {
    val exact = 1L << (m + 1)
    val shift = s"(($b >> $m) - 1)"
    s"CAST(CASE WHEN $b < $exact THEN $b ELSE " +
      s"($b - $shift * ${1L << m}) << $shift END AS BIGINT)"
  }

  /** Upper-bound expression for bucket SQL `b`. */
  def upperBoundSql(b: String, m: Int): String = {
    val exact = 1L << (m + 1)
    val shift = s"(($b >> $m) - 1)"
    s"CAST(CASE WHEN $b < $exact THEN $b ELSE " +
      s"${lowerBoundSql(b, m)} + (1::BIGINT << $shift) - 1 END AS BIGINT)"
  }

  /** `(bucket, cnt, est_lb, est_ub)` cells over `valueExpr` rows of
    * `fromClause` (e.g. `"lineitem"` or a restricted subquery).
    */
  def cellsSql(fromClause: String, valueExpr: String, m: Int): String =
    s"""WITH vals AS (SELECT CAST($valueExpr AS BIGINT) AS v
       |  FROM $fromClause WHERE $valueExpr IS NOT NULL),
       |cells AS (SELECT ${bucketSql("v", m)} AS bucket,
       |    count(*) AS cnt FROM vals GROUP BY 1)
       |SELECT bucket, cnt, ${lowerBoundSql("bucket", m)} AS est_lb,
       |  ${upperBoundSql("bucket", m)} AS est_ub
       |FROM cells ORDER BY bucket""".stripMargin

  /** Quantile answers over `valueExpr` rows of `fromClause`. */
  def quantilesSql(
      fromClause: String, valueExpr: String, qPermille: Seq[Int],
      m: Int): String = {
    val qRows = qPermille.sorted.map(q => s"($q)").mkString(", ")
    s"""WITH vals AS (SELECT CAST($valueExpr AS BIGINT) AS v
       |  FROM $fromClause WHERE $valueExpr IS NOT NULL),
       |cells AS (SELECT ${bucketSql("v", m)} AS bucket,
       |    count(*) AS cnt FROM vals GROUP BY 1),
       |cum AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket
       |    ROWS UNBOUNDED PRECEDING) AS cum FROM cells),
       |n AS (SELECT SUM(cnt) AS n FROM cells),
       |qs AS (SELECT * FROM (VALUES $qRows) t(q_permille)),
       |hit AS (SELECT q_permille, n.n AS n,
       |    (n.n * q_permille + 999) // 1000 AS rank, MIN(bucket) AS bucket
       |  FROM cum, n, qs WHERE cum >= (n.n * q_permille + 999) // 1000
       |  GROUP BY 1, 2, 3)
       |SELECT CAST(q_permille AS INT) AS q_permille, CAST(n AS BIGINT) AS n,
       |  CAST(rank AS BIGINT) AS rank, bucket,
       |  ${lowerBoundSql("bucket", m)} AS est_lb,
       |  ${upperBoundSql("bucket", m)} AS est_ub
       |FROM hit ORDER BY q_permille""".stripMargin
  }

  /** DuckDB rendering of [[discretize]] (`idExpr` must be unique and
    * sortable — the output orders by it).
    */
  def discretizeSql(
      fromClause: String, idExpr: String, valueExpr: String,
      qPermille: Seq[Int], m: Int = 5): String =
    s"""WITH q AS (${quantilesSql(fromClause, valueExpr, qPermille, m)}),
       |vals AS (SELECT $idExpr AS id, CAST($valueExpr AS BIGINT) AS v
       |  FROM $fromClause)
       |SELECT id, v,
       |  CAST((SELECT count(*) FROM q WHERE q.est_lb <= vals.v) AS INT)
       |    AS bin
       |FROM vals ORDER BY id""".stripMargin

  /** Per-group quantile answers; the group column is emitted as
    * `outGroupCol` (defaults to the expression itself, matching a
    * Spark side that renamed `g` back to the source column).
    */
  def quantilesPerGroupSql(
      fromClause: String, groupExpr: String, valueExpr: String,
      qPermille: Seq[Int], m: Int, outGroupCol: String = ""): String = {
    val outG = if (outGroupCol.isEmpty) groupExpr else outGroupCol
    val qRows = qPermille.sorted.map(q => s"($q)").mkString(", ")
    s"""WITH vals AS (SELECT $groupExpr AS g, CAST($valueExpr AS BIGINT) AS v
       |  FROM $fromClause WHERE $valueExpr IS NOT NULL),
       |cells AS (SELECT g, ${bucketSql("v", m)} AS bucket,
       |    count(*) AS cnt FROM vals GROUP BY 1, 2),
       |cum AS (SELECT g, bucket, SUM(cnt) OVER (PARTITION BY g
       |    ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum FROM cells),
       |n AS (SELECT g, SUM(cnt) AS n FROM cells GROUP BY g),
       |qs AS (SELECT * FROM (VALUES $qRows) t(q_permille)),
       |hit AS (SELECT cum.g, q_permille, n.n AS n,
       |    (n.n * q_permille + 999) // 1000 AS rank, MIN(bucket) AS bucket
       |  FROM cum JOIN n ON cum.g = n.g, qs
       |  WHERE cum >= (n.n * q_permille + 999) // 1000
       |  GROUP BY 1, 2, 3, 4)
       |SELECT g AS $outG, CAST(q_permille AS INT) AS q_permille,
       |  CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank, bucket,
       |  ${lowerBoundSql("bucket", m)} AS est_lb,
       |  ${upperBoundSql("bucket", m)} AS est_ub
       |FROM hit ORDER BY $outG, q_permille""".stripMargin
  }
}
