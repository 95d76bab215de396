package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** FD and RI audit semantics on hand tables. */
class IntegritySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("fdViolations lists only multi-valued determinants with multiplicity") {
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "z")).toDF("a", "b")
    val got = Integrity.fdViolations(df, Seq("a"), "b").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 2L, 3L)))
  }

  test("fdSummary: a holding FD reports zero violations, a broken one counts keys") {
    val df = Seq((1, 10, "x"), (2, 20, "x"), (2, 20, "y"), (3, 30, "x"))
      .toDF("k", "v", "w")
    val got = Integrity.fdSummary(df, Seq(
      ("k_to_v", Seq("k"), "v"), ("k_to_w", Seq("k"), "w")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("k_to_v") == (3L, 0L))
    assert(got("k_to_w") == (3L, 1L))
  }

  test("riAudit counts orphan rows and keys; null FKs are not orphans") {
    val child = Seq(Some(1), Some(1), Some(2), Some(9), None)
      .toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val r = Integrity.riAudit(child, "fk", parent, "pk").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (5L, 1L, 1L))
  }

  test("riAudit on a clean child reports zeros, not nulls") {
    val child = Seq(1, 2).toDF("fk")
    val parent = Seq(1, 2).toDF("pk")
    val r = Integrity.riAudit(child, "fk", parent, "pk").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (2L, 0L, 0L))
  }
}
