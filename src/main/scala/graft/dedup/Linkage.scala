package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured record linkage (entity resolution) — the Fellegi-Sunter
  * shape with deterministic integer weights: candidate pairs come
  * from a BLOCKING equi-join (never all-pairs, the same discipline as
  * every near-dup finder here), each pair scores as a sum of
  * per-field agreement weights, and pairs at or above `threshold`
  * are declared matches.
  *
  * Field comparators, all micro-integer so the oracle matches
  * bit-for-bit: the name similarity is `floor(jaro_winkler · wName)`
  * (the [[graft.functions.JaroWinkler]] codegen expression, pinned to
  * DuckDB's builtin — multiplying bit-identical doubles by the same
  * literal and flooring is engine-exact), exact-match fields
  * contribute their weight on equality, and numeric fields contribute
  * on |Δ| ≤ tolerance.
  *
  * 100 TB shape: the blocking join is a hash equi-join on the block
  * key; per-block pair volume is the operator's cost knob (pick keys
  * so blocks stay small — the [[Fuzzy]] length-band argument). The
  * scoring itself is map-side over the joined pairs.
  */
object Linkage {

  /** Score candidate pairs of `df` sharing `blockCol`: `(id_a, id_b,
    * name_sim, exact_pts, near_pts, score)` with `id_a < id_b`, kept
    * when `score >= threshold`. `exactCols` contribute `wExact` each
    * on equality; `nearCol` contributes `wNear` when |Δ| ≤ `tol`.
    */
  def scoredPairs(
      df: DataFrame, idCol: String, blockCol: String, nameCol: String,
      exactCols: Seq[String], nearCol: String, tol: Int,
      wName: Int = 500000, wExact: Int = 150000, wNear: Int = 100000,
      threshold: Int = 700000,
  ): DataFrame = {
    def side(tag: String) = {
      val cols = (Seq(idCol, blockCol, nameCol, nearCol) ++ exactCols)
        .map(c => col(c).as(s"${c}_$tag"))
      df.select(cols: _*)
    }
    val pairs = side("a").join(side("b"),
      col(s"${blockCol}_a") === col(s"${blockCol}_b") &&
        col(s"${idCol}_a") < col(s"${idCol}_b"))
    val nameSim = floor(graft.functions.JaroWinkler.jaro_winkler(
      col(s"${nameCol}_a"), col(s"${nameCol}_b")) * wName).cast("long")
    val exactPts = exactCols.map(c =>
      when(col(s"${c}_a") === col(s"${c}_b"), lit(wExact.toLong))
        .otherwise(lit(0L)))
      .reduceOption(_ + _).getOrElse(lit(0L))
    val nearPts = when(
      abs(col(s"${nearCol}_a") - col(s"${nearCol}_b")) <= tol,
      lit(wNear.toLong)).otherwise(lit(0L))
    pairs
      .select(col(s"${idCol}_a").as("id_a"), col(s"${idCol}_b").as("id_b"),
        nameSim.as("name_sim"), exactPts.as("exact_pts"),
        nearPts.as("near_pts"))
      .withColumn("score",
        col("name_sim") + col("exact_pts") + col("near_pts"))
      .filter(col("score") >= threshold)
  }

  /** DuckDB rendering of [[scoredPairs]] over `part` (blocking on
    * `p_brand`, name = `p_name`, exact = `p_type`, near = `p_size`)
    * restricted by `whereClause`.
    */
  def scoredPairsPartSql(
      whereClause: String, tol: Int,
      wName: Int = 500000, wExact: Int = 150000, wNear: Int = 100000,
      threshold: Int = 700000,
  ): String =
    s"""WITH p AS (SELECT p_partkey, p_brand, p_name, p_type, p_size
       |  FROM part $whereClause),
       |pr AS (SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       |    CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name) * $wName)
       |      AS BIGINT) AS name_sim,
       |    CAST(CASE WHEN a.p_type = b.p_type THEN $wExact ELSE 0 END
       |      AS BIGINT) AS exact_pts,
       |    CAST(CASE WHEN abs(a.p_size - b.p_size) <= $tol THEN $wNear
       |      ELSE 0 END AS BIGINT) AS near_pts
       |  FROM p a JOIN p b
       |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey)
       |SELECT id_a, id_b, name_sim, exact_pts, near_pts,
       |  name_sim + exact_pts + near_pts AS score
       |FROM pr WHERE name_sim + exact_pts + near_pts >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
}
