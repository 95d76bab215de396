package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingest/egress — the container format
  * web-crawl corpora actually arrive in (Common Crawl ships WARC/WET
  * shards). Spark has no WARC source; the standard distributed trick
  * (what Hadoop WARC jobs do with `textinputformat.record.delimiter`)
  * is to split the stream on the record header sentinel and parse
  * each record's header block + payload — here via the text source's
  * `lineSep` option, so reads stay fully distributed (one task per
  * split, no driver parsing, no UDFs — every field is a Column
  * expression inside codegen).
  *
  * Payloads are cut by `Content-Length` in BYTES (the WARC rule):
  * the record text round-trips through `encode`/`decode` so the cut
  * is byte-exact even for multi-byte UTF-8 payloads, and trailing
  * record separators never leak into the payload. Known limitation,
  * shared with every delimiter-split WARC reader: a payload that
  * itself contains the record sentinel (`WARC/1.0\r\n`) splits the
  * record mid-payload — real crawlers escape or length-frame such
  * content upstream; the reader surfaces it loudly (a headerless
  * tail row with null fields, and a head row whose payload comes up
  * short of Content-Length) rather than silently merging records.
  *
  * 100 TB shape: egress is one map-side projection per row into the
  * text sink (shardable by any upstream repartition); ingest is the
  * text source's split-parallel scan — listing-parallel across
  * shards, record-delimited within a shard — followed by map-only
  * header regexes. Nothing shuffles.
  */
object Warc {

  /** The record-start sentinel distributed reads split on (the
    * `lineSep` of the text source / the Hadoop record delimiter).
    */
  val RecordSentinel = "WARC/1.0\r\n"

  private def Sentinel = RecordSentinel

  /** Render one WARC/1.0 response record (header block + payload +
    * record separator) as a string column. `Content-Length` counts
    * payload BYTES, per the spec.
    */
  def toWarcRecord(id: Column, payload: Column): Column =
    concat(
      lit(Sentinel),
      lit("WARC-Type: response\r\n"),
      lit("WARC-Record-ID: <urn:graft:"), id.cast("string"), lit(">\r\n"),
      lit("WARC-Date: 2026-01-01T00:00:00Z\r\n"),
      lit("Content-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"),
      payload, lit("\r\n\r\n"))

  /** Write `(idCol, payloadCol)` rows as WARC shards under `path`
    * (text sink, one record per row; shard count = partition count).
    */
  def writeWarc(
      df: DataFrame, idCol: String, payloadCol: String, path: String,
  ): Unit =
    df.select(toWarcRecord(col(idCol), col(payloadCol)).as("value"))
      .write.mode("overwrite").text(path)

  /** Read WARC shards into `(record_id, warc_type, content_length,
    * payload)`. Records whose header block is malformed (e.g. the
    * headerless tail of a sentinel-containing payload) surface with
    * null fields; filter or quarantine downstream.
    *
    * TEXT-PAYLOAD DOOR (pinned contract, WarcSpec): payloads pass
    * through String, so a response record carrying non-UTF-8 bytes
    * (images, gzip'd HTTP bodies — common in response-type WARC) is
    * replacement-char-substituted, NOT byte-faithful. LLM pipelines
    * consume WET/text records, which this door serves exactly; for
    * byte-faithful response records use [[readWarcBinary]] /
    * [[readWarcGzBinary]], whose payload column is `binary` and
    * byte-cut before any String decode.
    */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    parseWarcRecords(spark.read.option("lineSep", Sentinel).text(path))

  /** Read `.warc.gz` shards — the wire format Common Crawl actually
    * ships: each shard is a CONCATENATION of gzip members
    * (conventionally one record per member, so an index can
    * range-read a single record). The sentinel-split text source
    * cannot see through gzip, so ingest is `binaryFile` → one
    * sequential multi-member inflate per shard (`GZIPInputStream`
    * handles member concatenation — the public warcio pattern) → the
    * SAME sentinel split and record parse as [[readWarc]], so
    * compressed and plain reads can never drift.
    *
    * 100 TB shape: parallelism is PER SHARD, the crawl deployment
    * unit (~1 GB shards, tens of thousands per crawl) —
    * listing-parallel binaryFile scan, one task per shard, map-only,
    * nothing shuffles. Within a shard gzip decompression is
    * inherently sequential (no sync points), which is exactly why
    * crawls ship many medium shards instead of few huge ones. The
    * inflate is STREAMED record-by-record: peak task memory is the
    * compressed shard + the largest single record, never the full
    * decompressed shard. Malformed gzip (corrupt member, plain text,
    * truncated trailer) fails LOUDLY with the inflater's IOException
    * — it never silently truncates or merges records.
    *
    * TEXT-PAYLOAD DOOR like [[readWarc]] (the same pinned contract):
    * byte-faithful response payloads go through [[readWarcGzBinary]].
    */
  def readWarcGz(spark: SparkSession, path: String): DataFrame =
    parseWarcGz(spark.read.format("binaryFile").load(s"$path/*.warc.gz"))

  /** The streaming compressed-ingest door: `.warc.gz` shards arrive
    * as FILES through the binaryFile FileStreamSource (one task per
    * shard, stateless Append — the [[readWarcStream]] contract with
    * the inflate in front), through the SAME member-inflate + parse
    * body as [[readWarcGz]], so compressed stream ≡ compressed batch
    * ≡ plain batch by construction.
    */
  def readWarcGzStream(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    // binaryFile's schema is fixed, but the STREAMING source demands
    // it explicitly (no inference on streams)
    val schema = StructType(Seq(StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    parseWarcGz(spark.readStream.format("binaryFile").schema(schema)
      .load(s"$path/*.warc.gz"))
  }

  /** Shared gz body over a binaryFile `(…, content)` frame (batch or
    * streaming): streamed multi-member inflate per shard, then the
    * ONE sentinel-split parse body.
    */
  def parseWarcGz(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    parseWarcRecords(bin
      .select(col("content")).as[Array[Byte]]
      .flatMap(bytes => gzRecordIterator(bytes))
      .toDF("value"))
  }

  /** Streamed multi-member inflate + sentinel split (the lineSep
    * semantics: separator removed, a leading empty split when the
    * stream opens with the sentinel — [[parseWarcRecords]] drops it).
    */
  private def gzRecordIterator(bytes: Array[Byte]): Iterator[String] =
    new Iterator[String] {
      private val reader = new java.io.InputStreamReader(
        new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes), 64 * 1024),
        java.nio.charset.StandardCharsets.UTF_8)
      private val buf = new Array[Char](64 * 1024)
      private val sb = new StringBuilder
      private var eof = false
      private var pending: List[String] = Nil
      private def fill(): Unit =
        while (pending.isEmpty && !eof) {
          val n = reader.read(buf)
          if (n < 0) {
            eof = true
            reader.close()
            if (sb.nonEmpty) { pending = List(sb.toString); sb.clear() }
          } else {
            // resume the sentinel scan where the previous fill left
            // off: everything before the last sentinel-length-1 chars
            // of the old tail was already scanned clean, so only a
            // match straddling the fill boundary can start there. A
            // record spanning F fills is O(R) total scan work instead
            // of the old from-zero rescan's O(F·R).
            val prevLen = sb.length
            sb.appendAll(buf, 0, n)
            var start = 0
            var idx = sb.indexOf(RecordSentinel,
              math.max(0, prevLen - RecordSentinel.length + 1))
            val done = List.newBuilder[String]
            while (idx >= 0) {
              done += sb.substring(start, idx)
              start = idx + RecordSentinel.length
              idx = sb.indexOf(RecordSentinel, start)
            }
            if (start > 0) sb.delete(0, start)
            pending = done.result()
          }
        }
      def hasNext: Boolean = { fill(); pending.nonEmpty }
      def next(): String = {
        fill()
        if (pending.isEmpty) throw new NoSuchElementException("empty")
        val h = pending.head; pending = pending.tail; h
      }
    }

  /** Write `(idCol, payloadCol)` rows as `.warc.gz` shards under
    * `path` — one shard per partition, one gzip MEMBER PER RECORD
    * (the Common Crawl layout [[readWarcGz]] reads and a record
    * index range-reads). The record rendering is [[toWarcRecord]],
    * shared with the plain writer. Egress is map-only (each task
    * writes its own shard); this writer targets a task-visible
    * filesystem — the verification-harness stance of the binary
    * ingest gates; a cluster egress would wrap the same member
    * framing in a Hadoop OutputFormat.
    */
  def writeWarcGz(
      df: DataFrame, idCol: String, payloadCol: String, path: String,
  ): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    df.select(toWarcRecord(col(idCol), col(payloadCol)).as("value"))
      .rdd.mapPartitionsWithIndex { (i, it) =>
        if (it.hasNext) {
          val f = java.nio.file.Paths.get(path, f"part-$i%05d.warc.gz")
          val out = new java.io.BufferedOutputStream(
            java.nio.file.Files.newOutputStream(f))
          // close-shield: lets each member's GZIPOutputStream be
          // close()d — releasing its native Deflater deterministically
          // instead of waiting on GC cleaners, which on a ~1 GB shard
          // of small records can exhaust native memory — while the
          // shard stream itself stays open across members
          val shield = new java.io.FilterOutputStream(out) {
            override def write(b: Array[Byte], off: Int, len: Int): Unit =
              out.write(b, off, len) // bulk (the filter default is per-byte)
            override def close(): Unit = flush()
          }
          try it.foreach { row =>
            val gz = new java.util.zip.GZIPOutputStream(shield)
            gz.write(row.getString(0)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            gz.close() // finish the member + end() its Deflater
          } finally out.close()
        }
        Iterator.single(i)
      }.count(): Unit
  }

  /** The streaming ingest door: WARC shards arrive as files, the text
    * FileStreamSource splits records on the sentinel, and the SAME
    * parse body as [[readWarc]] cuts each record — stream ≡ batch by
    * construction. Compose with a checkpointed Append sink.
    */
  def readWarcStream(spark: SparkSession, path: String): DataFrame =
    parseWarcRecords(spark.readStream.option("lineSep", Sentinel).text(path))

  /** Shared record parse over a sentinel-split `value` frame (batch
    * or streaming) — ONE body, so the two doors can never drift.
    */
  def parseWarcRecords(raw0: DataFrame): DataFrame = {
    val raw = raw0
      .filter(length(col("value")) > 0) // drop the pre-sentinel empty split
    val headers = substring_index(col("value"), "\r\n\r\n", 1)
    val contentLength =
      nullif(regexp_extract(headers, "(?m)^Content-Length: ([0-9]+)\r?$", 1),
        lit("")).cast("long")
    // byte-exact payload cut: skip the header block + blank line in
    // bytes, then take Content-Length bytes (substr on BINARY indexes
    // bytes, so multi-byte payloads cut exactly where the spec says)
    raw.select(
      nullif(regexp_extract(headers,
        "(?m)^WARC-Record-ID: <([^>]*)>\r?$", 1), lit("")).as("record_id"),
      nullif(regexp_extract(headers, "(?m)^WARC-Type: ([^\r\n]*)\r?$", 1),
        lit("")).as("warc_type"),
      contentLength.as("content_length"),
      // the cast("int") of the substr length would WRAP for a
      // (malformed or adversarial) Content-Length >= 2^31 — the
      // wrapped negative length yields an empty payload with no
      // signal; guard the cut so oversized claims surface as the
      // same loud null-payload row as other malformed records
      when(contentLength.between(0L, Int.MaxValue.toLong),
        decode(encode(col("value"), "UTF-8")
          .substr(octet_length(headers) + lit(5), contentLength.cast("int")),
          "UTF-8"))
        .otherwise(lit(null).cast("string"))
        .as("payload"))
  }

  // ---- Binary-faithful doors (response-type records) -----------------

  /** BYTE-FAITHFUL WARC read: `(record_id, warc_type, content_length,
    * payload: binary)` with the payload byte-cut BEFORE any String
    * decode — the door for response-type records whose bodies are not
    * UTF-8 text (images, gzip'd HTTP bodies). The header block is
    * ASCII by the WARC spec and is the only part decoded; payload
    * bytes pass through untouched. Record split, field rules, and
    * malformed-record semantics mirror [[readWarc]] exactly (null
    * fields on a bad header block; a Content-Length past the record
    * end yields the available bytes — the same comes-up-short row
    * the text door surfaces).
    *
    * 100 TB shape: binaryFile listing-parallel scan, one task per
    * shard, map-only byte scans — nothing shuffles, nothing decodes.
    */
  def readWarcBinary(spark: SparkSession, path: String): DataFrame =
    parseWarcBinary(spark.read.format("binaryFile").load(s"$path/*.warc"),
      gz = false)

  /** [[readWarcBinary]] over `.warc.gz` shards: the same streamed
    * multi-member inflate as [[readWarcGz]], but splitting and
    * cutting BYTES — payloads never round-trip through a charset.
    */
  def readWarcGzBinary(spark: SparkSession, path: String): DataFrame =
    parseWarcBinary(spark.read.format("binaryFile").load(s"$path/*.warc.gz"),
      gz = true)

  /** Shared binary body over a binaryFile `(…, content)` frame. */
  private def parseWarcBinary(bin: DataFrame, gz: Boolean): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val in: java.io.InputStream =
          if (gz) new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes), 64 * 1024)
          else new java.io.ByteArrayInputStream(bytes)
        byteRecordIterator(in).map(parseBinaryRecord)
      }
      .toDF("record_id", "warc_type", "content_length", "payload")
  }

  private val SentinelBytes =
    RecordSentinel.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val HeaderEndBytes =
    "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** One record's byte parse — the [[parseWarcRecords]] rules applied
    * to raw bytes: headers end at the first `\r\n\r\n` (ASCII-decoded
    * for the field regexes — header blocks are ASCII by spec), the
    * payload is the `Content-Length` bytes after it, never decoded.
    */
  private def parseBinaryRecord(
      rec: Array[Byte]): (String, String, java.lang.Long, Array[Byte]) = {
    val he = indexOfBytes(rec, HeaderEndBytes, 0)
    val headerEnd = if (he < 0) rec.length else he
    val headers = new String(rec, 0, headerEnd,
      java.nio.charset.StandardCharsets.US_ASCII)
    def field(re: scala.util.matching.Regex): String =
      re.findFirstMatchIn(headers).map(_.group(1)).filter(_.nonEmpty).orNull
    val recordId = field("(?m)^WARC-Record-ID: <([^>]*)>\r?$".r)
    val warcType = field("(?m)^WARC-Type: ([^\r\n]*)\r?$".r)
    val clStr = field("(?m)^Content-Length: ([0-9]+)\r?$".r)
    val cl: java.lang.Long =
      try { if (clStr == null) null else java.lang.Long.valueOf(clStr) }
      catch { case _: NumberFormatException => null }
    val payload: Array[Byte] =
      if (he < 0 || cl == null || cl < 0L || cl > Int.MaxValue.toLong) null
      else {
        val start = headerEnd + HeaderEndBytes.length
        val end = math.min(rec.length.toLong, start + cl).toInt
        if (start > rec.length) Array.emptyByteArray
        else java.util.Arrays.copyOfRange(rec, start, end)
      }
    (recordId, warcType, cl, payload)
  }

  /** Streamed byte-level sentinel split — [[gzRecordIterator]] +
    * [[parseWarcRecords]]'s combined semantics (separator removed,
    * EMPTY splits dropped — the text door's `length > 0` filter)
    * without any charset round-trip.
    */
  private def byteRecordIterator(
      in: java.io.InputStream): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private val buf = new Array[Byte](64 * 1024)
      // ONE growing accumulator, valid bytes [0, len): records are cut
      // out by offset, the un-consumed tail compacts to the front with
      // a single arraycopy per fill, and the sentinel scan resumes at
      // the fill boundary — a record spanning F fills costs O(R) scan
      // + O(R) amortized copy instead of the old per-fill
      // acc.toByteArray + from-zero rescan's O(F·R) of each.
      private var acc = new Array[Byte](64 * 1024)
      private var len = 0
      private var eof = false
      private var pending: List[Array[Byte]] = Nil
      private def fill(): Unit =
        while (pending.isEmpty && !eof) {
          val n = in.read(buf)
          if (n < 0) {
            eof = true
            in.close()
            if (len > 0) pending =
              List(java.util.Arrays.copyOfRange(acc, 0, len))
          } else {
            if (len + n > acc.length) {
              val grown = new Array[Byte](
                math.max(acc.length * 2, len + n))
              System.arraycopy(acc, 0, grown, 0, len)
              acc = grown
            }
            System.arraycopy(buf, 0, acc, len, n)
            val prevLen = len
            len += n
            var cur = 0
            var idx = indexOfBytes(acc, SentinelBytes,
              math.max(0, prevLen - SentinelBytes.length + 1), len)
            val done = List.newBuilder[Array[Byte]]
            while (idx >= 0) {
              if (idx > cur)
                done += java.util.Arrays.copyOfRange(acc, cur, idx)
              cur = idx + SentinelBytes.length
              idx = indexOfBytes(acc, SentinelBytes, cur, len)
            }
            if (cur > 0) {
              System.arraycopy(acc, cur, acc, 0, len - cur)
              len -= cur
            }
            pending = done.result()
          }
        }
      def hasNext: Boolean = { fill(); pending.nonEmpty }
      def next(): Array[Byte] = {
        fill()
        if (pending.isEmpty) throw new NoSuchElementException("empty")
        val h = pending.head; pending = pending.tail; h
      }
    }

  private def indexOfBytes(
      hay: Array[Byte], needle: Array[Byte], from: Int,
      until: Int = -1): Int = {
    var i = math.max(from, 0)
    val last = (if (until >= 0) until else hay.length) - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
