package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources and sinks (parquet / csv / json) with the
  * options that matter for correctness at scale.
  *
  * Scale notes: always pass an explicit schema for csv/json — schema
  * inference is a full extra pass over the data (at 100 TB, a 100 TB
  * pre-read). Writers partition by low-cardinality columns only
  * (partitionBy on a high-cardinality key creates a small-files
  * explosion); `maxRecordsPerFile` bounds file size skew.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema) // no inference pass
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSONL ingest with CORRUPT-RECORD QUARANTINE — the robustness
    * door a 100 TB crawl feed needs: a malformed line must neither
    * fail the job (FAILFAST) nor vanish silently (DROPMALFORMED);
    * PERMISSIVE mode nulls the data fields and lands the raw line in
    * `corruptCol`, so downstream filters quarantine it with full
    * provenance and the good/bad census is one aggregation away.
    * The scan stays listing-parallel and map-only like any JSON read.
    * (Spark caveat, worth knowing: a projection referencing ONLY the
    * corrupt column is disallowed — select at least one data field
    * alongside it.)
    */
  def readJsonQuarantine(
      spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt",
  ): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already defines $corruptCol")
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Raw-file ingest through Spark's `binaryFile` source — the entry
    * step of every multimodal pipeline (a directory of images/audio
    * clips/model shards becomes a `(path, length, content: binary)`
    * frame that the `graft.multimodal` decoders consume). The scan is
    * distributed file-at-a-time with NO decode on the driver;
    * `pathGlobFilter` prunes at LISTING time (non-matching files are
    * never opened), and the returned frame carries only the columns
    * selected here — drop `content` upstream of any census that
    * doesn't need bytes and the reader still never ships payloads.
    * At 100 TB-of-small-files the listing itself is the bottleneck;
    * this reader composes with a manifest-driven load
    * ([[shardManifest]]) exactly like the parquet scans.
    */
  def readBinaryFiles(
      spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("length"),
        org.apache.spark.sql.functions.col("content"))

  /** Z-ordered parquet write: range-partition AND sort the data by
    * the Morton interleave of two quantized integer dimensions before
    * writing ([[graft.functions.ZInterleave]]), so every output
    * file's — and every row group's — min/max envelope is tight in
    * BOTH dimensions. Readers then prune files/row groups on
    * predicates over EITHER column; a lexicographic sort serves only
    * its leading key. This is the Delta/Iceberg `ZORDER BY` layout
    * with plain parquet files.
    *
    * `colA`/`colB` must be integral and pre-quantized to `bits` bits
    * (the interleave masks, so quantize upstream — `% 2^bits` or a
    * width bucket). `numFiles` bounds output file count: the range
    * partitioner samples the z distribution, so files carry disjoint
    * z ranges.
    */
  def writeZOrdered(df: DataFrame, path: String,
      colA: String, colB: String, bits: Int = 10,
      numFiles: Int = 0): Unit =
    writeCurveOrdered(df, path, colA, colB, bits, numFiles, curve = "zorder")

  /** [[writeZOrdered]] generalized over the space-filling curve:
    * `curve = "zorder"` (Morton) or `"hilbert"`
    * ([[graft.functions.HilbertIndex]] — unit-step walk, tighter
    * envelopes on zones that straddle quadrant seams; see
    * [[hilbertSkipContrast]] for the measured trade). Same plan
    * either way: compute the key, range-partition by it (the range
    * partitioner samples the key distribution, so files carry
    * disjoint curve ranges), sort within partitions, drop the key.
    */
  def writeCurveOrdered(df: DataFrame, path: String,
      colA: String, colB: String, bits: Int = 10,
      numFiles: Int = 0, curve: String = "hilbert"): Unit = {
    require(!df.columns.contains("__z"),
      "writeCurveOrdered reserves column name __z; rename it in the input")
    import org.apache.spark.sql.functions.col
    val key = curve match {
      case "zorder" =>
        graft.functions.ZInterleave.z_interleave(col(colA), col(colB), bits)
      case "hilbert" =>
        graft.functions.HilbertIndex.hilbert_index(col(colA), col(colB), bits)
      case other =>
        throw new IllegalArgumentException(
          s"curve '$other' is not one of zorder, hilbert")
    }
    val z = df.withColumn("__z", key)
    val ranged =
      if (numFiles > 0) z.repartitionByRange(numFiles, col("__z"))
      else z.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC sink/scan — the columnar alternative when the lakehouse
    * standardizes on ORC (Hive estates): same predicate-pushdown and
    * column-pruning behavior as the parquet path (`.explain` shows
    * PushedFilters/ReadSchema on the OrcScan).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Small-file compaction planning — the lakehouse maintenance pass:
    * given a file manifest `(file id, size)`, assign each file to a
    * compaction group by its cumulative byte offset (`offset div
    * targetBytes`), so groups are contiguous in `idCol` order and
    * average `targetBytes` (a file straddling a boundary lands in the
    * group its FIRST byte falls in — the cumulative-offset binning
    * Delta/Iceberg OPTIMIZE planners use; groups can exceed the
    * target by at most one file, never undershoot by more than one).
    *
    * Scale: the manifest is METADATA — one row per file, millions of
    * rows for a 100 TB table at most — so the single-partition
    * running-sum window is the sanctioned shard-manifest pattern,
    * never a data-sized sort. Output: `(idCol, n_bytes, grp,
    * grp_offset)`.
    */
  def compactionPlan(
      files: DataFrame, idCol: String, sizeCol: String, targetBytes: Long,
  ): DataFrame = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("__cum_before",
        coalesce(sum(col(sizeCol).cast("long")).over(w), lit(0L)))
      .select(col(idCol), col(sizeCol).cast("long").as("n_bytes"),
        expr(s"__cum_before div ${targetBytes}L").as("grp"),
        (col("__cum_before") % targetBytes).as("grp_offset"))
  }

  /** The manifest [[writeSharded]] computes: one row per shard with
    * its row count and order-independent content checksum.
    */
  def shardManifest(
      df: DataFrame, idCol: String, checksumCols: Seq[String],
      nShards: Int, seed: Long = 42L): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    require(!df.columns.contains("shard"),
      "shardManifest reserves column name shard; rename it in the input")
    import org.apache.spark.sql.functions._
    import graft.ops.Checksum
    val sharded = df.withColumn("shard",
      (graft.ops.Sampling.bucket(col(idCol), seed) % nShards).cast("int"))
    // the per-shard form of Checksum.checksum: same injective row
    // tokens, grouped instead of global
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        Checksum.digestSum(
          Checksum.rowDigest(checksumCols, c => col(c).cast("string")))
          .as("checksum"))
  }

  /** DuckDB rendering of [[shardManifest]] over `table`. */
  def shardManifestSql(
      table: String, idExpr: String, checksumCols: Seq[String],
      nShards: Int, seed: Long = 42L, whereClause: String = ""): String = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val shard = s"(${graft.ops.Sampling.bucketSql(idExpr, seed)} % $nShards)"
    val sum = graft.ops.Checksum.digestSumSql(
      checksumCols.map(c => c -> s"CAST($c AS VARCHAR)"))
    s"""SELECT CAST($shard AS INT) AS shard, count(*) AS n_rows,
       |$sum AS checksum
       |FROM $table $whereClause GROUP BY 1""".stripMargin
  }

  /** Deterministic sharded training-set write: rows land in
    * `nShards` md5-bucket shards (stable in `(idCol, seed)` — the
    * same row lands in the same shard on every run and every
    * cluster), written as `path/shard=K/...` parquet, one file per
    * shard by default. Returns the MANIFEST — `(shard, n_rows,
    * checksum)` with an order-independent content checksum per shard
    * ([[graft.ops.Checksum]]'s digest-sum) — computed from the DATA,
    * so a downstream loader (or tomorrow's re-run) can verify each
    * shard it reads against 16 bytes instead of re-reading the
    * corpus. Verify on the written files with [[shardManifest]] over
    * `readParquet(path)`.
    *
    * 100 TB shape: shard assignment is a map-only expression; the
    * write shuffles once on the shard key (`repartition(shard)` —
    * one file per shard, sized by the shard budget, no small-files
    * explosion); the manifest is one grouped digest-sum over the
    * same pass's columns. Non-integral or composite ids: pass any
    * expression column through a projection first.
    */
  def writeSharded(
      df: DataFrame, path: String, idCol: String,
      checksumCols: Seq[String], nShards: Int, seed: Long = 42L,
  ): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    require(!df.columns.contains("shard"),
      "writeSharded reserves column name shard; rename it in the input")
    import org.apache.spark.sql.functions._
    val sharded = df.withColumn("shard",
      (graft.ops.Sampling.bucket(col(idCol), seed) % nShards).cast("int"))
    sharded.repartition(nShards, col("shard"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
    shardManifest(df, idCol, checksumCols, nShards, seed)
  }

  /** Zone maps — per-zone (file / row-group) min-max statistics for
    * one column, the metadata parquet footers and Delta/Iceberg
    * manifests keep per file. Input: `(zone, v)` rows; output one
    * METADATA row per zone: `(zone, min_v, max_v, n_rows)`. A range
    * predicate `v BETWEEN lo AND hi` can skip every zone whose
    * envelope misses the range entirely — the reason clustered
    * layouts ([[writeZOrdered]], range-partitioned writes) dominate
    * at scale: I/O is proportional to zones SCANNED, not corpus size.
    */
  def zoneMaps(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    rows.groupBy(col("zone"))
      .agg(min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        count(lit(1)).as("n_rows"))
  }

  /** Data-skipping effectiveness contrast between two physical
    * layouts of the SAME rows — the quantified case for clustering:
    *
    *   - `random`    — zones assigned by hash bucket (arrival-order /
    *     unclustered ingest): every zone's min-max envelope spans
    *     nearly the full domain, so a selective range predicate skips
    *     ~nothing;
    *   - `clustered` — zones assigned by fixed-width value binning on
    *     the predicate column (what a range-partitioned or z-ordered
    *     write produces): envelopes are tight and disjoint, so the
    *     same predicate skips all but the overlapping zones.
    *
    * For each layout, rows are zoned, [[zoneMaps]] computes the
    * envelope census, and one summary row reports how many zones —
    * and how many ROWS — the predicate `v BETWEEN lo AND hi` skips.
    * All arithmetic is integer (caller supplies an integral `v`, e.g.
    * epoch days): the clustered zone id is
    * `(v - vmin) * nZones div (vmax - vmin + 1)` with the global
    * bounds from a 1-row broadcast, never a sort; the random zone is
    * the md5 bucket mod nZones. Both layouts reduce to a
    * zone-count-sized metadata aggregate — the whole operator is two
    * keyed censuses over one scan each, no shuffle larger than the
    * zone count.
    *
    * Output: `(layout, n_zones, zones_skipped, rows_skipped,
    * n_rows)`, one row per layout.
    */
  def layoutSkipContrast(
      df: DataFrame, idCol: String, valCol: String,
      nZones: Int, lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column, seed: Long = 42L): DataFrame = {
    require(nZones > 0, s"nZones $nZones must be positive")
    import org.apache.spark.sql.functions._
    val base = df.select(col(idCol).as("id"), col(valCol).cast("long").as("v"))
    val bounds = base.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val clustered = base.crossJoin(broadcast(bounds))
      .select(expr(s"(v - vmin) * ${nZones}L div (vmax - vmin + 1)")
        .as("zone"), col("v"))
    val random = base
      .select((graft.ops.Sampling.bucket(col("id"), seed) % nZones)
        .as("zone"), col("v"))
    def summarize(layout: String, rows: DataFrame): DataFrame =
      zoneMaps(rows)
        .agg(count(lit(1)).as("n_zones"),
          sum(when(col("max_v") < lo || col("min_v") > hi, 1L)
            .otherwise(0L)).as("zones_skipped"),
          sum(when(col("max_v") < lo || col("min_v") > hi, col("n_rows"))
            .otherwise(0L)).as("rows_skipped"),
          sum(col("n_rows")).as("n_rows"))
        .select(lit(layout).as("layout"), col("n_zones"),
          col("zones_skipped"), col("rows_skipped"), col("n_rows"))
    summarize("clustered", clustered).unionByName(summarize("random", random))
  }

  /** TWO-dimensional skipping contrast — why [[writeZOrdered]] exists:
    * the same rows zoned two ways, (a) `lex` — binned on the FIRST
    * dimension only (what a lexicographic sort's file layout gives
    * you), (b) `zorder` — binned on the Morton interleave of both
    * dimensions — then a range predicate on EACH dimension evaluated
    * against each layout's zone envelopes. The lex layout serves only
    * its leading key (skips nothing for the y predicate: every zone
    * spans all of y); the z-order layout skips substantially on
    * EITHER dimension, because Morton locality keeps both
    * coordinates' spans ~√zones-narrow per zone.
    *
    * Both dims must be pre-quantized to `bits` bits (the
    * [[writeZOrdered]] contract). Zone ids are pure integer
    * arithmetic on the known domains (`x · nZones div 2^bits`,
    * `z · nZones div 2^(2·bits)`) — no sort, no sampling; everything
    * reduces to two zone-count-sized envelope censuses per
    * dimension.
    *
    * Output: `(layout, pred, n_zones, zones_skipped, rows_skipped,
    * n_rows)` — four rows (2 layouts × 2 predicates).
    */
  def zorderSkipContrast(
      df: DataFrame, xCol: String, yCol: String, bits: Int, nZones: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits $bits out of [1, 16]")
    require(nZones > 0, s"nZones $nZones must be positive")
    import org.apache.spark.sql.functions._
    val dom = 1L << bits
    val zdom = 1L << (2 * bits)
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
      .withColumn("z",
        graft.functions.ZInterleave.z_interleave(col("x"), col("y"), bits))
    def summarize(layout: String, zoneExpr: String, pred: String,
        vCol: String, lo: Long, hi: Long): DataFrame =
      zoneMaps(base.select(expr(zoneExpr).as("zone"), col(vCol).as("v")))
        .agg(count(lit(1)).as("n_zones"),
          sum(when(col("max_v") < lo || col("min_v") > hi, 1L)
            .otherwise(0L)).as("zones_skipped"),
          sum(when(col("max_v") < lo || col("min_v") > hi, col("n_rows"))
            .otherwise(0L)).as("rows_skipped"),
          sum(col("n_rows")).as("n_rows"))
        .select(lit(layout).as("layout"), lit(pred).as("pred"),
          col("n_zones"), col("zones_skipped"), col("rows_skipped"),
          col("n_rows"))
    val lexZone = s"x * ${nZones}L div ${dom}L"
    val zZone = s"z * ${nZones}L div ${zdom}L"
    summarize("lex", lexZone, "x", "x", xLo, xHi)
      .unionByName(summarize("lex", lexZone, "y", "y", yLo, yHi))
      .unionByName(summarize("zorder", zZone, "x", "x", xLo, xHi))
      .unionByName(summarize("zorder", zZone, "y", "y", yLo, yHi))
  }

  /** DuckDB rendering of [[zorderSkipContrast]] over `(xExpr, yExpr)`
    * rows from `fromClause`.
    */
  def zorderSkipContrastSql(
      fromClause: String, xExpr: String, yExpr: String, bits: Int,
      nZones: Int, xLo: Long, xHi: Long, yLo: Long, yHi: Long): String = {
    val dom = 1L << bits
    val zdom = 1L << (2 * bits)
    val z = graft.functions.ZInterleave.zInterleaveSql("x", "y", bits)
    def arm(layout: String, zoneExpr: String, pred: String,
        vCol: String, lo: Long, hi: Long): String =
      s"""SELECT '$layout' AS layout, '$pred' AS pred,
         |  CAST(count(*) AS BIGINT) AS n_zones,
         |  CAST(SUM(CASE WHEN max_v < $lo OR min_v > $hi
         |    THEN 1 ELSE 0 END) AS BIGINT) AS zones_skipped,
         |  CAST(SUM(CASE WHEN max_v < $lo OR min_v > $hi
         |    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
         |  CAST(SUM(n_rows) AS BIGINT) AS n_rows
         |FROM (SELECT $zoneExpr AS zone, MIN($vCol) AS min_v,
         |    MAX($vCol) AS max_v, count(*) AS n_rows
         |  FROM base GROUP BY 1) zm""".stripMargin
    val lexZone = s"x * $nZones // $dom"
    val zZone = s"zz * $nZones // $zdom"
    s"""WITH base AS MATERIALIZED (SELECT CAST($xExpr AS BIGINT) AS x,
       |    CAST($yExpr AS BIGINT) AS y
       |  FROM $fromClause),
       |basez AS MATERIALIZED (SELECT x, y, $z AS zz FROM base)
       |SELECT * FROM (
       |${arm("lex", lexZone, "x", "x", xLo, xHi)
        .replace("FROM base GROUP", "FROM basez GROUP")}
       |UNION ALL
       |${arm("lex", lexZone, "y", "y", yLo, yHi)
        .replace("FROM base GROUP", "FROM basez GROUP")}
       |UNION ALL
       |${arm("zorder", zZone, "x", "x", xLo, xHi)
        .replace("FROM base GROUP", "FROM basez GROUP")}
       |UNION ALL
       |${arm("zorder", zZone, "y", "y", yLo, yHi)
        .replace("FROM base GROUP", "FROM basez GROUP")}) u
       |ORDER BY layout, pred""".stripMargin
  }

  /** The space-filling-curve face-off [[zorderSkipContrast]] sets up:
    * the SAME rows zoned by Morton (z) and by Hilbert index
    * ([[graft.functions.HilbertIndex]]), each layout's zone-map
    * envelopes evaluated against range predicates on both dimensions.
    * The curves differ only on zones that straddle quadrant seams:
    * when `nZones` divides the grid into aligned quadrant tiles
    * (a power of four) both curves produce the SAME tiles and the
    * contrast is vacuous — pick a non-power-of-four `nZones`, where
    * Morton's seam jump widens a straddling zone's box while
    * Hilbert's unit-step walk keeps it tight. Hilbert then skips
    * more zones in aggregate, though the win can be asymmetric
    * across dimensions — this census puts the measured number on
    * that trade. Same scale shape as the z contrast: two map-side
    * censuses over integer zone ids, 2 layouts x 2 predicates rows.
    */
  def hilbertSkipContrast(
      df: DataFrame, xCol: String, yCol: String, bits: Int, nZones: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits $bits out of [1, 16]")
    require(nZones > 0, s"nZones $nZones must be positive")
    import org.apache.spark.sql.functions._
    val zdom = 1L << (2 * bits)
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
      .withColumn("z",
        graft.functions.ZInterleave.z_interleave(col("x"), col("y"), bits))
      .withColumn("h",
        graft.functions.HilbertIndex.hilbert_index(col("x"), col("y"), bits))
    def summarize(layout: String, zoneExpr: String, pred: String,
        vCol: String, lo: Long, hi: Long): DataFrame =
      zoneMaps(base.select(expr(zoneExpr).as("zone"), col(vCol).as("v")))
        .agg(count(lit(1)).as("n_zones"),
          sum(when(col("max_v") < lo || col("min_v") > hi, 1L)
            .otherwise(0L)).as("zones_skipped"),
          sum(when(col("max_v") < lo || col("min_v") > hi, col("n_rows"))
            .otherwise(0L)).as("rows_skipped"),
          sum(col("n_rows")).as("n_rows"))
        .select(lit(layout).as("layout"), lit(pred).as("pred"),
          col("n_zones"), col("zones_skipped"), col("rows_skipped"),
          col("n_rows"))
    val zZone = s"z * ${nZones}L div ${zdom}L"
    val hZone = s"h * ${nZones}L div ${zdom}L"
    summarize("hilbert", hZone, "x", "x", xLo, xHi)
      .unionByName(summarize("hilbert", hZone, "y", "y", yLo, yHi))
      .unionByName(summarize("zorder", zZone, "x", "x", xLo, xHi))
      .unionByName(summarize("zorder", zZone, "y", "y", yLo, yHi))
  }

  /** DuckDB rendering of [[hilbertSkipContrast]]: the Hilbert index
    * comes from the unrolled CTE chain
    * ([[graft.functions.HilbertIndex.hilbertSqlCtes]]), the rest
    * mirrors [[zorderSkipContrastSql]].
    */
  def hilbertSkipContrastSql(
      fromClause: String, xExpr: String, yExpr: String, bits: Int,
      nZones: Int, xLo: Long, xHi: Long, yLo: Long, yHi: Long): String = {
    val zdom = 1L << (2 * bits)
    val z = graft.functions.ZInterleave.zInterleaveSql("x", "y", bits)
    val hilb = graft.functions.HilbertIndex.hilbertSqlCtes(
      "base", "x", "y", bits, passCols = Seq("x", "y"),
      finalCte = "hfin", outCol = "hh")
    def arm(layout: String, zoneExpr: String, pred: String,
        vCol: String, lo: Long, hi: Long): String =
      s"""SELECT '$layout' AS layout, '$pred' AS pred,
         |  CAST(count(*) AS BIGINT) AS n_zones,
         |  CAST(SUM(CASE WHEN max_v < $lo OR min_v > $hi
         |    THEN 1 ELSE 0 END) AS BIGINT) AS zones_skipped,
         |  CAST(SUM(CASE WHEN max_v < $lo OR min_v > $hi
         |    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
         |  CAST(SUM(n_rows) AS BIGINT) AS n_rows
         |FROM (SELECT $zoneExpr AS zone, MIN($vCol) AS min_v,
         |    MAX($vCol) AS max_v, count(*) AS n_rows
         |  FROM basez GROUP BY 1) zm""".stripMargin
    val zZone = s"zz * $nZones // $zdom"
    val hZone = s"hh * $nZones // $zdom"
    s"""WITH base AS MATERIALIZED (SELECT CAST($xExpr AS BIGINT) AS x,
       |    CAST($yExpr AS BIGINT) AS y
       |  FROM $fromClause),
       |$hilb,
       |basez AS MATERIALIZED (SELECT x, y, $z AS zz, hh FROM hfin)
       |SELECT * FROM (
       |${arm("hilbert", hZone, "x", "x", xLo, xHi)}
       |UNION ALL
       |${arm("hilbert", hZone, "y", "y", yLo, yHi)}
       |UNION ALL
       |${arm("zorder", zZone, "x", "x", xLo, xHi)}
       |UNION ALL
       |${arm("zorder", zZone, "y", "y", yLo, yHi)}) u
       |ORDER BY layout, pred""".stripMargin
  }

  /** DuckDB rendering of [[layoutSkipContrast]] over `(idExpr,
    * valExpr)` rows from `fromClause` (a table name or parenthesized
    * subquery; `valExpr` must already be integral).
    */
  def layoutSkipContrastSql(
      fromClause: String, idExpr: String, valExpr: String,
      nZones: Int, loSql: String, hiSql: String,
      seed: Long = 42L): String = {
    // rz reads the already-projected base CTE, where the id column is
    // named `id` — bucket over that, not over the raw idExpr
    val zoneRand = s"(${graft.ops.Sampling.bucketSql("id", seed)} % $nZones)"
    s"""WITH base AS MATERIALIZED (SELECT $idExpr AS id,
       |    CAST($valExpr AS BIGINT) AS v FROM $fromClause),
       |bounds AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM base),
       |cz AS (SELECT (v - vmin) * $nZones // (vmax - vmin + 1) AS zone, v
       |  FROM base, bounds),
       |rz AS (SELECT $zoneRand AS zone, v FROM base),
       |czm AS (SELECT zone, MIN(v) AS min_v, MAX(v) AS max_v,
       |    CAST(count(*) AS BIGINT) AS n_rows FROM cz GROUP BY zone),
       |rzm AS (SELECT zone, MIN(v) AS min_v, MAX(v) AS max_v,
       |    CAST(count(*) AS BIGINT) AS n_rows FROM rz GROUP BY zone),
       |summ AS (
       |  SELECT 'clustered' AS layout, CAST(count(*) AS BIGINT) AS n_zones,
       |    CAST(SUM(CASE WHEN max_v < ($loSql) OR min_v > ($hiSql)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS zones_skipped,
       |    CAST(SUM(CASE WHEN max_v < ($loSql) OR min_v > ($hiSql)
       |      THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
       |    CAST(SUM(n_rows) AS BIGINT) AS n_rows
       |  FROM czm
       |  UNION ALL
       |  SELECT 'random', CAST(count(*) AS BIGINT),
       |    CAST(SUM(CASE WHEN max_v < ($loSql) OR min_v > ($hiSql)
       |      THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN max_v < ($loSql) OR min_v > ($hiSql)
       |      THEN n_rows ELSE 0 END) AS BIGINT),
       |    CAST(SUM(n_rows) AS BIGINT)
       |  FROM rzm)
       |SELECT layout, n_zones, zones_skipped, rows_skipped, n_rows
       |FROM summ ORDER BY layout""".stripMargin
  }
}
