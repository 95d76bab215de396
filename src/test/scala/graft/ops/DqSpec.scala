package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DqSpec extends AnyFunSuite with SparkSpec {

  test("one row per rule; counts, pass_ppm, and null-predicate semantics") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (-2L, "ok"), (null, "bad"), (4L, null)).toDF("v", "s")
    val got = Dq.report(df, Seq(
      "v_negative" -> (col("v") < 0),
      "v_null" -> col("v").isNull,
      "s_unknown" -> !col("s").isin("ok")))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // v < 0 on the null row is NULL -> not a violation (explicit
    // isNull rule catches it); s_unknown: "bad" violates, null s does
    // not (three-valued logic)
    assert(got.toSeq === Seq(
      ("s_unknown", 1L, 4L, 750000L),
      ("v_negative", 1L, 4L, 750000L),
      ("v_null", 1L, 4L, 750000L)))
  }

  test("empty input yields zero counts and a null pass rate") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("v", "s")
    val got = Dq.report(df, Seq("any" -> (col("v") > 0))).collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === 0L && got(0).getLong(2) === 0L)
    assert(got(0).isNullAt(3))
  }

  test("rules are required") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      Dq.report(Seq((1L, "x")).toDF("v", "s"), Seq.empty))
  }
}
