package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.RollingHash

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions at session-build time (survives session
  * cloning, available to pure-SQL users), e.g.
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   .config("spark.sql.extensions", "graft.GraftExtensions") // or via config
  *   .getOrCreate()
  * }}}
  *
  * Verified end-to-end by `graft.ExtensionsDemo` (fresh-JVM main —
  * extensions only apply at session construction, so the shared test
  * session can't exercise this path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      exprs => RollingHash(exprs.head)))
    // opt-in logical rewrite: naive non-equi point-in-interval joins
    // become the binned equi-join decomposition when
    // spark.graft.rangeJoin.binWidth is set (see RangeJoinRewrite)
    e.injectOptimizerRule(graft.plans.RangeJoinRewrite)
  }
}

/** `sbt "runMain graft.ExtensionsDemo"` — proves the extension wires
  * rolling_hash into a fresh session's SQL surface.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = spark.sql(
      "SELECT rolling_hash('abc') AS h, rolling_hash('') AS empty").collect()
    println(s"rolling_hash('abc') = ${rows.head.getLong(0)}, " +
      s"rolling_hash('') = ${rows.head.getLong(1)}")
    val expected = "abc".foldLeft(0L)((h, c) => (h * 31 + c) % 2147483647L)
    assert(rows.head.getLong(0) == expected, "extension-registered function mismatch")

    // the injected optimizer rule: a naive non-equi range join must
    // plan as a binned equi-join once the bin width is set
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.graft.rangeJoin.binWidth", "16")
    val pts = (0L until 100L).map(i => (i, i * 3L % 200L)).toDF("pid", "p")
    val ivs = (0L until 10L).map(i => (i, i * 20L, i * 20L + 15L)).toDF("iid", "lo", "hi")
    val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range-join rewrite did not fire:\n$plan")
    val viaRule = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.unset("spark.graft.rangeJoin.binWidth")
    val naive = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaRule == naive, "rewritten join changed the result")
    println(s"range-join rewrite ok (${viaRule.size} pairs)")
    println("extensions ok")
    spark.stop()
  }
}
