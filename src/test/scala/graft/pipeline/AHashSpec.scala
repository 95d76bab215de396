package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.Multimodal

/** Average-hash semantics on hand grids, and the handoff into the
  * shared block-pair Hamming engine.
  */
class AHashSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("bits set exactly where luma exceeds the floor mean") {
    // lumas 10,20,30,40 -> mean 25 -> cells 2,3 set -> 0b1100
    val grid = Seq((1L, 0, 10L), (1L, 1, 20L), (1L, 2, 30L), (1L, 3, 40L))
      .toDF("id", "cell", "luma")
    assert(Multimodal.aHash(grid, bits = 4).head().getLong(1) == 12L)
  }

  test("the mean is floor-divided: a boundary cell stays unset") {
    // lumas 0,1,1,1: mean = 3 div 4 = 0 -> cells 1..3 set (luma 1 > 0)
    val grid = Seq((7L, 0, 0L), (7L, 1, 1L), (7L, 2, 1L), (7L, 3, 1L))
      .toDF("id", "cell", "luma")
    assert(Multimodal.aHash(grid, bits = 4).head().getLong(1) == 14L)
    // all-equal grid: nothing exceeds the mean -> hash 0
    val flat = Seq((8L, 0, 5L), (8L, 1, 5L), (8L, 2, 5L), (8L, 3, 5L))
      .toDF("id", "cell", "luma")
    assert(Multimodal.aHash(flat, bits = 4).head().getLong(1) == 0L)
  }

  test("cells beyond the bit width are ignored") {
    val grid = Seq((1L, 0, 10L), (1L, 1, 99L), (1L, 5, 0L))
      .toDF("id", "cell", "luma")
    // mean over ALL cells (10+99+0) div 3 = 36; only cell 1 packs
    assert(Multimodal.aHash(grid, bits = 4).head().getLong(1) == 2L)
  }

  test("near-identical grids pair through the banded engine; distinct ones don't") {
    // image 1 and 2 share a 48-cell ramp except one far-from-mean
    // cell; image 3 is the reversed ramp (hamming ~ bits/2)
    val ramp = (0 until 48).map(c => c -> (c * 5L))
    def img(id: Long, cells: Seq[(Int, Long)]) =
      cells.map { case (c, l) => (id, c, l) }
    val grid = (img(1L, ramp) ++
      img(2L, ramp.map { case (c, l) => c -> (if (c == 47) 0L else l) }) ++
      img(3L, ramp.map { case (c, l) => c -> (235L - l) }))
      .toDF("id", "cell", "luma")
    val pairs = graft.dedup.Dedup.simhashNearDupPairsFromSignatures(
      Multimodal.aHash(grid), maxHamming = 5, blocks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
