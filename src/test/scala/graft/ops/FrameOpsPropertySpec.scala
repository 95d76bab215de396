package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property-based FrameOps tests — the ScalaCheck port of the
  * reference's Hypothesis layer
  * (`/root/reference/tests/test_dataframe_operations.py`,
  * `tests/test_connector.py:20-40`), driven with a seeded Gen chain
  * (scalatestplus is unavailable offline).
  */
class FrameOpsPropertySpec extends AnyFunSuite with SparkSpec {

  private case class Fx(
      cols: Seq[String], rows: Seq[Seq[String]], renamed: Seq[String])

  private val fxGen: Gen[Fx] = for {
    nCols <- Gen.choose(1, 4)
    nRows <- Gen.choose(0, 6)
    cells <- Gen.listOfN(nCols * nRows,
      Gen.oneOf(Gen.alphaNumStr.map(_.take(5)), Gen.const(null: String)))
  } yield {
    val cols = (0 until nCols).map(i => s"c$i")
    val renamed = (0 until nCols).map(i => s"r$i")
    val rows = (0 until nRows).map(r => (0 until nCols).map(c => cells(r * nCols + c)))
    Fx(cols, rows, renamed)
  }

  private def mkDf(cols: Seq[String], rows: Seq[Seq[String]]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), 2),
      StructType(cols.map(c => StructField(c, StringType, nullable = true))))

  private def iterate[A](gen: Gen[A], n: Int)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(7L)
    (1 to n).foreach { _ =>
      body(gen.pureApply(params, seed))
      seed = seed.next
    }
  }

  test("preprocess∘postprocess restores column names; output is deduped") {
    iterate(fxGen, 10) { fx =>
      val df = mkDf(fx.cols, fx.rows)
      val m = fx.cols.zip(fx.renamed).toMap
      val pre = FrameOps.preprocess(df, m)
      assert(pre.columns.toSeq.sorted == fx.renamed.sorted)
      assert(pre.count() == pre.dropDuplicates().count())
      val post = FrameOps.postprocess(pre, m)
      assert(post.columns.toSeq.sorted == fx.cols.sorted)
    }
  }

  test("getRows is a deduped projection; compare is reflexive") {
    iterate(fxGen, 10) { fx =>
      val df = mkDf(fx.cols, fx.rows)
      val sub = fx.cols.take(1 + fx.cols.size / 2)
      val rows = FrameOps.getRows(df, sub)
      assert(rows.columns.toSeq == sub)
      assert(rows.count() == df.select(sub.map(FrameOps.quoted): _*).distinct().count())
      // A7 reflexivity: any frame exactly-compares with itself
      if (fx.rows.nonEmpty) FrameOps.compareFrames(df, df, exact = true)
    }
  }

  test("mergeIds preserves row count when db keys are unique (incl. null keys)") {
    iterate(fxGen, 8) { fx =>
      val df0 = mkDf(fx.cols, fx.rows)
      val df = df0.dropDuplicates()
      val n = df.count()
      if (n > 0) {
        import org.apache.spark.sql.functions._
        val dbSide = df.withColumn("the_id",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(fx.cols.map(FrameOps.quoted): _*)))
        val merged = FrameOps.mergeIds(df, dbSide, "the_id", "t")
        assert(merged.count() == n)
        assert(merged.filter(col("the_id").isNull).count() == 0)
      }
    }
  }
}
