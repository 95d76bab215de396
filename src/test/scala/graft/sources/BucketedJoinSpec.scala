package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Scale-path evidence: pre-bucketing both sides of a recurring join
  * on the join key removes the per-query shuffle entirely — the
  * pattern SCALE.md prescribes for repeated 100 TB fact joins.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions._

  test("bucketed tables join without a shuffle exchange") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    orders.write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val joined = spark.sql(
      """SELECT /*+ MERGE(lineitem_b) */ l_orderkey, o_totalprice, l_quantity
        |FROM lineitem_b JOIN orders_b ON l_orderkey = o_orderkey""".stripMargin)

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == lineitem.count())

    spark.sql("DROP TABLE orders_b")
    spark.sql("DROP TABLE lineitem_b")
  }
}
