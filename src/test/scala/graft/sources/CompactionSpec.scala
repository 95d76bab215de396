package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CompactionSpec extends AnyFunSuite with SparkSpec {

  private def plan(target: Long, sizes: (Long, Long)*) = {
    import spark.implicits._
    Sources.compactionPlan(sizes.toDF("f", "sz"), "f", "sz", target)
      .orderBy("f").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("groups are contiguous and bin by cumulative offset") {
    val got = plan(100L, 1L -> 60L, 2L -> 60L, 3L -> 60L, 4L -> 60L)
    // offsets 0, 60, 120, 180 -> groups 0, 0, 1, 1
    assert(got.map(_._3).toSeq === Seq(0L, 0L, 1L, 1L))
    assert(got.map(_._4).toSeq === Seq(0L, 60L, 20L, 80L))
  }

  test("a file straddling a boundary lands in its first byte's group") {
    val got = plan(100L, 1L -> 90L, 2L -> 50L, 3L -> 10L)
    // file 2 starts at offset 90 (group 0) though it ends at 140
    assert(got.map(_._3).toSeq === Seq(0L, 0L, 1L))
  }

  test("an oversized file occupies groups alone; successors restart cleanly") {
    val got = plan(100L, 1L -> 350L, 2L -> 10L)
    // file 2 starts at offset 350 -> group 3
    assert(got.map(_._3).toSeq === Seq(0L, 3L))
  }

  test("target must be positive") {
    intercept[IllegalArgumentException](plan(0L, 1L -> 1L))
  }
}
