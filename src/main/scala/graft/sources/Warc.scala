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
    */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    parseWarcRecords(spark.read.option("lineSep", Sentinel).text(path))

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
      when(contentLength.isNotNull,
        decode(encode(col("value"), "UTF-8")
          .substr(octet_length(headers) + lit(5), contentLength.cast("int")),
          "UTF-8"))
        .as("payload"))
  }
}
