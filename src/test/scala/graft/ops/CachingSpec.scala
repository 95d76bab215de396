package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Cache-lifecycle guards: the loan-style persists
  * ([[Caching.withPersisted]]) must leave the session's CacheManager
  * empty once the gated query has been built — a long-lived session
  * (notebook, multi-query driver) must not accumulate dead
  * MEMORY_AND_DISK entries from queries that internally share a scan.
  */
class CachingSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cacheEmpty: Boolean =
    spark.sharedState.cacheManager.isEmpty

  test("withPersisted releases the loan and returns the body's rows") {
    import spark.implicits._
    spark.catalog.clearCache()
    val src = Seq((1, "a"), (2, "a"), (3, "b")).toDF("id", "g")
    val out = Caching.withPersisted(src) { cached =>
      val totals = cached.groupBy($"g").agg(count(lit(1)).as("n"))
      cached.join(broadcast(totals), Seq("g")).select($"id", $"n")
    }
    assert(cacheEmpty, "loaned frame still cached after withPersisted")
    assert(out.orderBy("id").collect().map(r => (r.getInt(0), r.getLong(1)))
      .toSeq == Seq((1, 2L), (2, 2L), (3, 1L)))
  }

  test("withPersisted releases the loan when the body throws") {
    import spark.implicits._
    spark.catalog.clearCache()
    val src = Seq(1, 2).toDF("id")
    intercept[RuntimeException] {
      Caching.withPersisted(src) { _ => throw new RuntimeException("boom") }
    }
    assert(cacheEmpty, "loaned frame still cached after a failing body")
  }

  test("lastLoanPlan is consume-and-clear: a second read never sees a stale plan") {
    import spark.implicits._
    val f = Seq((1, "a"), (2, "b")).toDF("k", "v")
    Caching.withPersisted(f)(df => df.groupBy("v").count()).count()
    assert(Caching.lastLoanPlan.nonEmpty, "first read returns the loan body's plan")
    assert(Caching.lastLoanPlan.isEmpty,
      "second read must return empty — a stale plan could validate the wrong query")
  }

  test("loaned gated queries leave the CacheManager empty") {
    // the queries whose shared-scan persists are loan-scoped; each
    // must build AND execute without leaving a cache entry behind
    for (q <- Seq("q11_important_parts", "q17_small_quantity",
      "q22_idle_customers", "t_winsorize", "t_length_outliers",
      "t_token_drift", "e_semantic_contam")) {
      spark.catalog.clearCache()
      val n = SparkEntry.queries(q)(spark, sf).count()
      assert(n >= 0)
      assert(cacheEmpty, s"$q left entries in the CacheManager")
    }
  }
}
