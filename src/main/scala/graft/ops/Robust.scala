package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group anomaly detection — median/MAD flagging, the
  * monitoring statistic that survives the exact pathology it hunts
  * (a mean/stddev z-score is dragged by the outliers themselves; the
  * median and the Median Absolute Deviation have 50% breakdown).
  * A value is flagged when `|v − median| > k · MAD` (Hampel's rule;
  * k = 3 ≈ the classic 2σ at normality).
  *
  * Both medians run through the mergeable [[QuantileSketch]] — the
  * only scale-safe formulation: per-group EXACT medians would sort
  * each group (the whole-partition window this library bans), while
  * the sketch collapses any group size to ≤ ~2k integer cells with
  * map-side combine. The estimates are deterministic (the sketch is
  * order-independent), so the whole census hash-gates; the estimate
  * error is bounded by the sketch's 2^-m relative envelope on both
  * the median and the MAD — fine for a FLAGGING rule (the threshold
  * k dominates the envelope).
  *
  * Scale shape: two sketch censuses (each one map-combined groupBy)
  * + two broadcast joins of group-count-sized statistics + one final
  * keyed census. Nothing row-sized ever shuffles except the raw
  * scan's own aggregations.
  *
  * Output: `(g, med_est, mad_est, n, n_outliers)` per group.
  */
object Robust {

  /** `df` must carry integral `valueCol`; groups by `groupCol`. */
  def madOutlierCensus(
      df: DataFrame, groupCol: String, valueCol: String,
      m: Int = 5, k: Int = 3): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val med = QuantileSketch.quantilesPerGroup(
      QuantileSketch.cellsPerGroup(vals, "g", "v", m), Seq(500), m)
      .select(col("g"), col("est_ub").as("med_est"))
    val dev = vals.join(broadcast(med), Seq("g"))
      .withColumn("d", abs(col("v") - col("med_est")))
    val mad = QuantileSketch.quantilesPerGroup(
      QuantileSketch.cellsPerGroup(dev, "g", "d", m), Seq(500), m)
      .select(col("g"), col("est_ub").as("mad_est"))
    dev.join(broadcast(mad), Seq("g"))
      .groupBy(col("g"), col("med_est"), col("mad_est"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > lit(k.toLong) * col("mad_est"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** DuckDB rendering of [[madOutlierCensus]]: the two sketch passes
    * as nested CTE chains mirroring
    * [[QuantileSketch.quantilesPerGroupSql]]'s algebra.
    */
  def madOutlierCensusSql(
      fromClause: String, groupExpr: String, valueExpr: String,
      m: Int = 5, k: Int = 3): String = {
    import QuantileSketch.{bucketSql, upperBoundSql}
    def medianOf(src: String, vcol: String, out: String): String =
      s"""${out}_cells AS (SELECT g, ${bucketSql(vcol, m)} AS bucket,
         |    count(*) AS cnt FROM $src GROUP BY 1, 2),
         |${out}_cum AS (SELECT g, bucket, SUM(cnt) OVER (PARTITION BY g
         |    ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM ${out}_cells),
         |${out}_n AS (SELECT g, SUM(cnt) AS n FROM ${out}_cells GROUP BY g),
         |$out AS (SELECT c.g, ${upperBoundSql("MIN(bucket)", m)} AS est
         |  FROM ${out}_cum c JOIN ${out}_n n ON c.g = n.g
         |  WHERE cum >= (n.n * 500 + 999) // 1000
         |  GROUP BY c.g)""".stripMargin
    s"""WITH vals AS MATERIALIZED (SELECT $groupExpr AS g,
       |    CAST($valueExpr AS BIGINT) AS v
       |  FROM $fromClause WHERE $valueExpr IS NOT NULL),
       |${medianOf("vals", "v", "med")},
       |dev AS MATERIALIZED (SELECT vals.g, v, med.est AS med_est,
       |    abs(v - med.est) AS d
       |  FROM vals JOIN med ON vals.g = med.g),
       |${medianOf("dev", "d", "mad")}
       |SELECT dev.g, CAST(med_est AS BIGINT) AS med_est,
       |  CAST(mad.est AS BIGINT) AS mad_est,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN d > $k * mad.est THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_outliers
       |FROM dev JOIN mad ON dev.g = mad.g
       |GROUP BY dev.g, med_est, mad.est
       |ORDER BY dev.g""".stripMargin
  }
}
