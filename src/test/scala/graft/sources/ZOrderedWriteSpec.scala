package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.ZInterleave.z_interleave

class ZOrderedWriteSpec extends AnyFunSuite with SparkSpec {

  test("z-ordered write: files carry disjoint z ranges, sorted within") {
    val rows = for (a <- 0L until 32L; b <- 0L until 32L) yield Row(a, b)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(rows.toVector), 8),
      StructType(Seq(StructField("x", LongType), StructField("y", LongType))))
    val dir = Files.createTempDirectory("zorder").toString
    Sources.writeZOrdered(df, dir, "x", "y", bits = 5, numFiles = 4)

    val back = spark.read.parquet(dir)
      .select(input_file_name().as("f"),
        z_interleave(col("x"), col("y"), 5).as("z"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(back.length === 1024)

    val byFile = back.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byFile.size >= 2, "expected multiple output files")
    // within-file sortedness: parquet preserves row order per file
    byFile.foreach { case (f, zs) =>
      assert(zs.zip(zs.tail).forall { case (p, n) => p <= n },
        s"file $f not z-sorted")
    }
    // cross-file disjointness: range partitioning gives non-overlapping
    // z intervals (sorted by each file's min, every max <= next min)
    val ranges = byFile.values.map(zs => (zs.min, zs.max)).toSeq.sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, prevMax), (nextMin, _)) =>
      assert(prevMax <= nextMin, "file z ranges overlap")
    }
  }

  test("hilbert-ordered write: disjoint curve ranges, sorted within") {
    import graft.functions.HilbertIndex.hilbert_index
    val rows = for (a <- 0L until 32L; b <- 0L until 32L) yield Row(a, b)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(rows.toVector), 8),
      StructType(Seq(StructField("x", LongType), StructField("y", LongType))))
    val dir = Files.createTempDirectory("hilbert").toString
    Sources.writeCurveOrdered(df, dir, "x", "y", bits = 5, numFiles = 4,
      curve = "hilbert")

    val back = spark.read.parquet(dir)
      .select(input_file_name().as("f"),
        hilbert_index(col("x"), col("y"), 5).as("h"),
        col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(back.length === 1024)
    val byFile = back.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap
    assert(byFile.size >= 2, "expected multiple output files")
    byFile.foreach { case (f, hs) =>
      assert(hs.map(_._1).zip(hs.map(_._1).tail)
        .forall { case (p, n) => p <= n }, s"file $f not hilbert-sorted")
    }
    val ranges = byFile.values.map(hs => (hs.map(_._1).min, hs.map(_._1).max))
      .toSeq.sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, prevMax), (nextMin, _)) =>
      assert(prevMax <= nextMin, "file hilbert ranges overlap")
    }
    // the layout claim itself: every file's x/y bounding box over the
    // full grid is tight — area O(m) for a contiguous Hilbert segment
    // of length m (the published locality constant is < 6; sampled
    // range boundaries keep real files near quadrant-aligned)
    byFile.foreach { case (f, hs) =>
      val area = (hs.map(_._2).max - hs.map(_._2).min + 1) *
        (hs.map(_._3).max - hs.map(_._3).min + 1)
      assert(area <= 6L * hs.length, s"file $f envelope too loose: $area")
    }
    assert(byFile.keySet.size >= 2)
  }

  test("writeCurveOrdered rejects an unknown curve") {
    val df = spark.range(4).selectExpr("id AS x", "id AS y")
    intercept[IllegalArgumentException] {
      Sources.writeCurveOrdered(df, "/tmp/nope", "x", "y", 5, 2, curve = "peano")
    }
  }
}
