package graft.ann

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PoolSpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (g, v) => Row(g, v) }, 2),
      StructType(Seq(StructField("g", LongType),
        StructField("v", ArrayType(FloatType)))))

  private def pool(rows: Seq[(Long, Seq[Float])]) =
    Pool.meanPool(frame(rows), "g", "v")
      .orderBy("group", "dim_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("hand-computed mean over exactly-quantizing values") {
    // 1.0 and 0.5 are multiples of 2^-20: mean q = 0.75 * 2^20 =
    // 786432, emitted in micro units
    val got = pool(Seq((1L, Seq(1.0f)), (1L, Seq(0.5f))))
    assert(got.toSeq == Seq((1L, 0L, 2L, 786432000000L)))
  }

  test("negative components pool with FLOOR semantics (offset device)") {
    // mean of -0.5: exact; and a -3/3 case whose truncating div would
    // give 0 but floor gives -1 micro
    val a = pool(Seq((1L, Seq(-0.5f))))
    assert(a.head._4 == -524288000000L)
    val tiny = -3.0f / (1 << 20) // q = -3 per chunk? no: one vec q=-3
    val b = Pool.meanPool(
      frame(Seq((1L, Seq(tiny)), (1L, Seq(0.0f)), (1L, Seq(0.0f)))),
      "g", "v").collect().head.getLong(3)
    assert(b == -1000000L, s"expected floor(-1) micro, got $b")
  }

  test("components outside [-1, 1] raise instead of silently splitting the engines") {
    val e = intercept[Exception] {
      Pool.meanPool(frame(Seq((1L, Seq(-1.5f)))), "g", "v").collect()
    }
    assert(e.getMessage.contains("outside [-1, 1]") ||
      Option(e.getCause).exists(_.getMessage.contains("outside [-1, 1]")),
      s"unexpected error: $e")
    // boundary values are in-contract: mean_micro = q·1e6 with
    // q = floor(x·2^20) (the file's unit — see the x=-0.5 test above)
    val ok = Pool.meanPool(frame(Seq((1L, Seq(-1.0f, 1.0f)))), "g", "v")
      .orderBy("dim_idx").collect().map(_.getLong(3))
    assert(ok.toSeq == Seq(-1048576000000L, 1048576000000L))
  }

  test("groups and dims aggregate independently of partitioning") {
    val rows = (0L until 30L).map(i =>
      (i % 4, Seq((i.toFloat - 15) / 16f, (i % 7).toFloat / 8f)))
    val a = pool(rows)
    val b = Pool.meanPool(frame(rows).repartition(7), "g", "v")
      .orderBy("group", "dim_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_._3 > 0) && a.length == 8) // 4 groups x 2 dims
  }
}
