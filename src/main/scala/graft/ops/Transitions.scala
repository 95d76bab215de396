package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition census over per-user event
  * sequences — the behavior-model primitive (next-event prediction,
  * anomalous-flow detection, bot filtering by improbable paths): for
  * every ordered adjacent pair of event types within a user's
  * timeline, the transition count and its integer-ppm conditional
  * probability `P(dst | src)`.
  *
  * Shape: ONE per-user window (`lead` over `(ts, id)` — the same
  * single-shuffle sessionize frame) produces the adjacent pairs
  * map-side; the census is a `groupBy(src, dst)` whose state is
  * |types|² cells regardless of corpus size, and the conditional
  * denominator joins back on the src-marginal census (types-sized,
  * broadcast). Probabilities are floor-quantized ppm
  * (`n·10^6 div n_src` — non-negative operands, so Spark `div` ≡
  * DuckDB `//`), the library's standard log-free device.
  *
  * Self-transitions are real data (repeat events) and kept; the last
  * event of each user has no successor and contributes nothing.
  */
object Transitions {

  /** `(src, dst, n, n_src, p_ppm)` transition census. `tsCol` is the
    * ns-long event time; ties break by `idCol` like every ordered
    * event operator here.
    */
  def transitionCensus(
      events: DataFrame, userCol: String, tsCol: String, idCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
    val census = pairs.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val marginal = census.groupBy(col("src")).agg(sum(col("n")).as("n_src"))
    census.join(broadcast(marginal), Seq("src"))
      .select(col("src"), col("dst"), col("n"), col("n_src"),
        expr("n * 1000000L div n_src").as("p_ppm"))
  }

  /** DuckDB rendering of [[transitionCensus]] over
    * `events(user_id, ts, event_id, event_type)` restricted by
    * `whereClause`.
    */
  def transitionCensusSql(whereClause: String): String =
    s"""WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id,
       |    event_type AS src FROM events $whereClause),
       |p AS (SELECT src, lead(src) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id) AS dst FROM e),
       |c AS (SELECT src, dst, count(*) AS n FROM p
       |  WHERE dst IS NOT NULL GROUP BY src, dst),
       |m AS (SELECT src, CAST(SUM(n) AS BIGINT) AS n_src FROM c GROUP BY src)
       |SELECT c.src, c.dst, c.n, m.n_src,
       |  CAST(c.n * 1000000 // m.n_src AS BIGINT) AS p_ppm
       |FROM c JOIN m ON c.src = m.src
       |ORDER BY c.src, c.dst""".stripMargin
}
