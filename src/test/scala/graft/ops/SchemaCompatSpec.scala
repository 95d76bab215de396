package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Registry compat rules: every change kind classified, and the two
  * verdicts follow the reader/writer asymmetry.
  */
class SchemaCompatSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def m(rows: (String, String, Boolean)*) =
    rows.toDF("col_name", "dtype", "nullable")

  private def diffMap(prev: org.apache.spark.sql.DataFrame,
      next: org.apache.spark.sql.DataFrame) =
    SchemaCompat.diff(prev, next).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getBoolean(2), r.getBoolean(3))).toMap

  test("every change kind gets the registry verdicts") {
    val prev = m(("a", "bigint", true), ("b", "int", false),
      ("c", "string", true), ("d", "double", true),
      ("e", "string", false), ("f", "string", true))
    val next = m(("a", "bigint", true), ("b", "bigint", false),
      ("d", "int", true),
      ("e", "string", true), ("f", "string", false),
      ("g", "string", true), ("h", "bigint", false))
    assert(diffMap(prev, next) == Map(
      "a" -> (("same", true, true)),
      "b" -> (("widened", true, false)),    // old writers emit int
      "c" -> (("dropped", false, true)),    // old readers select it
      "d" -> (("retyped", false, false)),   // double -> int narrows
      "e" -> (("null_loosened", true, true)),
      "f" -> (("null_tightened", true, false)), // old writers' nulls
      "g" -> (("added", true, true)),       // nullable addition
      "h" -> (("added", true, false))))     // required addition
  }

  test("widening is directional: bigint -> int is a retype") {
    val got = diffMap(m(("x", "bigint", true)), m(("x", "int", true)))("x")
    assert(got == (("retyped", false, false)))
  }

  test("identical manifests are all-same, both compatible") {
    val a = m(("x", "int", true), ("y", "string", false))
    val d = diffMap(a, a)
    assert(d.values.forall(_ == (("same", true, true))))
  }
}
