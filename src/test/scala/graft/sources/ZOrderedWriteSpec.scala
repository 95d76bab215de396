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
}
