package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class UpsertSpec extends AnyFunSuite with SparkSpec {

  test("updates win on matched keys, insert on new, untouched pass through") {
    import spark.implicits._
    val target = Seq((1L, "t1"), (2L, "t2"), (3L, "t3")).toDF("id", "v")
    val updates = Seq((2L, "U2"), (9L, "U9")).toDF("id", "v")
    val got = Upsert.upsert(target, updates, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "t1"), (2L, "U2"), (3L, "t3"), (9L, "U9")))
  }

  test("column order follows the update batch; names must match") {
    import spark.implicits._
    val target = Seq((1L, "a", 10)).toDF("id", "v", "n")
    val updates = Seq((2, "b", 5L)).toDF("n", "v", "id") // same names, other order
    val got = Upsert.upsert(target, updates.select("id", "v", "n")
      .selectExpr("id", "v", "cast(n as int) n"), "id")
    assert(got.columns.toSeq === Seq("id", "v", "n"))
    assert(got.count() === 2)
  }
}
