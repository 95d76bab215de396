package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.RollingHash.rolling_hash

class RollingHashSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions.col

  private def reference(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }

  test("rolling_hash matches the reference recurrence (codegen path)") {
    val inputs = Seq("abc", "", "hello world", "ümlaut", "emoji \ud83d\ude00 tail", "a" * 5000)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(inputs.map(Row(_)) :+ Row(null), 2),
      StructType(Seq(StructField("s", StringType, nullable = true))))
    val got = df.select(col("s"), rolling_hash(col("s")).as("h")).collect()
      .map(r => Option(r.getString(0)) -> Option(r.getAs[java.lang.Long]("h")))
      .toMap
    inputs.foreach { s =>
      assert(got(Some(s)) == Some(reference(s)), s"mismatch for '$s'")
    }
    assert(got(None).isEmpty, "null input must hash to null")
  }

  test("rolling_hash registered for SQL") {
    RollingHash.register(spark)
    val h = spark.sql("SELECT rolling_hash('abc') AS h").collect().head.getLong(0)
    assert(h == reference("abc"))
  }

  test("rolling_hash over a literal is constant-folded by Catalyst") {
    RollingHash.register(spark)
    val df = spark.range(1).selectExpr("rolling_hash('fold me') AS h")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("rollinghash"),
      s"expected constant folding, got:\n$optimized")
  }
}
