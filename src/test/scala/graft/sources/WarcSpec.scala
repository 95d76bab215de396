package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** WARC egress/ingest: byte-exact round trips (multi-byte UTF-8,
  * embedded CRLF-CRLF inside payloads, multi-line payloads, empty
  * payloads), header parsing, shard parallelism, and the documented
  * sentinel-in-payload failure surfacing loudly instead of merging.
  */
class WarcSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  private def roundtrip(rows: (Long, String)*): Map[Long, (Long, String)] = {
    val dir = Files.createTempDirectory("warc_spec_").toString
    Warc.writeWarc(docs(rows: _*), "doc_id", "text", s"$dir/w")
    Warc.readWarc(spark, s"$dir/w")
      .select(
        regexp_extract(col("record_id"), "urn:graft:([0-9]+)", 1)
          .cast("long").as("id"),
        col("content_length"), col("payload"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
  }

  test("round-trips payloads byte-exactly, incl. unicode and embedded CRLF-CRLF") {
    val rows = Seq(
      1L -> "plain ascii payload",
      2L -> "naïve ☃ 漢字 — multi-byte",
      3L -> "line one\nline two\n\nline four",
      4L -> "embedded\r\n\r\nseparator stays inside",
      5L -> "")
    val got = roundtrip(rows: _*)
    assert(got.keySet === rows.map(_._1).toSet)
    for ((id, text) <- rows) {
      assert(got(id)._2 === text, s"payload $id corrupted")
      assert(got(id)._1 === text.getBytes("UTF-8").length.toLong,
        s"content_length $id is not the byte count")
    }
  }

  test("header fields parse: type, record id, content length") {
    val dir = Files.createTempDirectory("warc_spec_").toString
    Warc.writeWarc(docs(7L -> "x"), "doc_id", "text", s"$dir/w")
    val r = Warc.readWarc(spark, s"$dir/w").collect().head
    assert(r.getString(0) === "urn:graft:7")
    assert(r.getString(1) === "response")
    assert(r.getLong(2) === 1L)
    assert(r.getString(3) === "x")
  }

  test("many records across shards read back complete and distinct") {
    val rows = (1L to 200L).map(i => i -> s"payload $i with ${"x" * (i % 17).toInt}")
    val got = roundtrip(rows: _*)
    assert(got.size === 200)
    assert(rows.forall { case (id, t) => got(id)._2 == t })
  }

  test("streaming ingest door equals the batch reader on the same shards") {
    val rows = Seq(
      1L -> "alpha payload",
      2L -> "naïve ☃ multi-byte",
      3L -> "multi\nline\npayload",
      4L -> "")
    val dir = Files.createTempDirectory("warc_spec_").toString
    Warc.writeWarc(docs(rows: _*), "doc_id", "text", s"$dir/w")
    val batch = Warc.readWarc(spark, s"$dir/w")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3)))
      .toSet
    // the same records as raw shard bytes through the streaming door
    // (2 shards -> 2 micro-batches), parsed by the SHARED body
    val recs = docs(rows: _*).select(
        col("doc_id"),
        Warc.toWarcRecord(col("doc_id"), col("text")).as("rec"))
      .orderBy("doc_id").collect().map(_.getString(1))
    val shards = recs.grouped(2)
      .map(g => g.mkString("", "\n", "\n").getBytes("UTF-8")).toSeq
    val streamed = graft.streaming.Replay.replayRawText(spark, shards,
        Map("lineSep" -> Warc.RecordSentinel), Warc.parseWarcRecords)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3)))
      .toSet
    assert(streamed === batch)
    assert(streamed.size === 4)
  }

  test("a payload containing the record sentinel surfaces loudly, never merges") {
    val rows = Seq(10L -> "clean", 11L -> "bad WARC/1.0\r\n payload")
    val dir = Files.createTempDirectory("warc_spec_").toString
    Warc.writeWarc(docs(rows: _*), "doc_id", "text", s"$dir/w")
    val all = Warc.readWarc(spark, s"$dir/w").collect()
    // the clean record still parses; the split record yields a head
    // whose payload comes up short (or a headerless null-field tail),
    // and NO row merges the two payloads
    val clean = all.filter(r => r.getString(0) == "urn:graft:10")
    assert(clean.length === 1 && clean.head.getString(3) === "clean")
    assert(all.forall(r => r.isNullAt(3) ||
      !r.getString(3).contains("clean") || r.getString(3) == "clean"),
      s"records merged: ${all.mkString("; ")}")
    val bad = all.filter(r => r.getString(0) == "urn:graft:11")
    assert(bad.forall(r => r.isNullAt(3) || r.getString(3) != rows(1)._2),
      "the sentinel-containing payload cannot survive delimiter splitting intact")
  }

  test("an oversized Content-Length claim yields the loud null payload, never a wrapped cut") {
    // 2^31 + 10 wraps to a negative int — the guard must surface the
    // record as the same null-payload row as other malformed records
    val rec = Warc.RecordSentinel +
      "WARC-Type: response\r\nWARC-Record-ID: <urn:graft:1>\r\n" +
      s"Content-Length: ${Int.MaxValue.toLong + 11L}\r\n\r\npayload\r\n\r\n"
    val dir = Files.createTempDirectory("warc_spec_").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "rec.warc"), rec.getBytes("UTF-8"))
    val rows = Warc.readWarc(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(2) === Int.MaxValue.toLong + 11L,
      "the claimed length still parses")
    assert(rows.head.isNullAt(3), "oversized claim must yield a null payload")
  }

  test("gz roundtrip is byte-exact and member-concatenation genuinely splits records") {
    val rows = Seq(
      1L -> "plain ascii payload",
      2L -> "naïve ☃ 漢字 — multi-byte",
      3L -> "embedded\r\n\r\nseparator stays inside",
      4L -> "", 5L -> "five", 6L -> "six", 7L -> "seven")
    val dir = Files.createTempDirectory("warc_gz_spec_").toString
    Warc.writeWarcGz(docs(rows: _*), "doc_id", "text", s"$dir/w")
    // 3 input partitions, 7 records: at least one shard holds >= 3
    // gzip members, so the multi-member inflate is genuinely on trial
    val shards = new java.io.File(s"$dir/w").listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(shards.nonEmpty && shards.length <= 3)
    val got = Warc.readWarcGz(spark, s"$dir/w")
      .select(regexp_extract(col("record_id"), "urn:graft:([0-9]+)", 1)
        .cast("long").as("id"), col("content_length"), col("payload"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got.keySet === rows.map(_._1).toSet)
    for ((id, text) <- rows) {
      assert(got(id)._2 === text, s"payload $id corrupted through gzip")
      assert(got(id)._1 === text.getBytes("UTF-8").length.toLong)
    }
    // and the compressed read equals the plain read on the same rows
    Warc.writeWarc(docs(rows: _*), "doc_id", "text", s"$dir/plain")
    val plain = Warc.readWarc(spark, s"$dir/plain")
      .select(col("record_id"), col("content_length"), col("payload"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val gz = Warc.readWarcGz(spark, s"$dir/w")
      .select(col("record_id"), col("content_length"), col("payload"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(gz === plain, "gz and plain readers drifted")
  }

  test("gz streaming ingest equals the gz batch reader on the same shards") {
    val rows = Seq(1L -> "alpha", 2L -> "naïve ☃", 3L -> "", 4L -> "delta")
    def member(rec: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(rec.getBytes("UTF-8")); gz.close(); bo.toByteArray
    }
    val recs = docs(rows: _*).select(
        Warc.toWarcRecord(col("doc_id"), col("text")).as("rec"))
      .orderBy("rec").collect().map(_.getString(0))
    val shards = recs.grouped(2).map(_.flatMap(member)).toSeq
    val streamed = graft.streaming.Replay.replayRawBinary(spark, shards,
      ".warc.gz", bin => Warc.parseWarcGz(bin))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3)))
      .toSet
    val dir = Files.createTempDirectory("warc_gz_st_").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/w"))
    shards.zipWithIndex.foreach { case (b, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/w", f"s$i%02d.warc.gz"), b)
    }
    val batch = Warc.readWarcGz(spark, s"$dir/w")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3)))
      .toSet
    assert(streamed === batch)
    assert(streamed.size === 4)
  }

  test("malformed gzip fails loudly — plain text through the gz reader never parses silently") {
    val dir = Files.createTempDirectory("warc_gz_bad_").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/w"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/w", "bogus.warc.gz"),
      (Warc.RecordSentinel + "WARC-Type: response\r\n\r\n").getBytes("UTF-8"))
    val ex = intercept[org.apache.spark.SparkException] {
      Warc.readWarcGz(spark, s"$dir/w").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[java.util.zip.ZipException]),
      s"expected a loud ZipException, got: $ex")
  }

  // a WARC response record with an arbitrary-BYTE body (the binary
  // doors' reality: images, gzip'd HTTP bodies)
  private def binRecord(id: Long, body: Array[Byte]): Array[Byte] = {
    val header = (Warc.RecordSentinel +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:graft:$id>\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    header ++ body ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  // NOT valid UTF-8: a BOM-ish lead, a gzip magic, an embedded
  // header-end sequence, an overlong-encoding fragment
  private val binPayload: Array[Byte] =
    Array(0xFF, 0xFE, 0x00, 0x1F, 0x8B, 0x08).map(_.toByte) ++
      "\r\n\r\n".getBytes("US-ASCII") ++
      Array(0x80, 0xC3, 0x28, 0x7F).map(_.toByte)

  test("binary door: non-UTF-8 response payloads round-trip byte-exactly, plain and gz") {
    val dir = Files.createTempDirectory("warc_bin_spec_").toString
    val shard = binRecord(1L, binPayload) ++
      binRecord(2L, "plain text body".getBytes("UTF-8"))
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/w"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/w", "s0.warc"), shard)
    def check(df: DataFrame): Unit = {
      val got = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getAs[Array[Byte]](3))).sortBy(_._1)
      assert(got.length === 2)
      assert(got.forall(_._2 === "response"))
      assert(got(0)._1 === "urn:graft:1" &&
        got(0)._3 === binPayload.length.toLong)
      assert(got(0)._4.toSeq === binPayload.toSeq,
        "binary payload not byte-faithful")
      assert(got(1)._4.toSeq === "plain text body".getBytes("UTF-8").toSeq)
    }
    check(Warc.readWarcBinary(spark, s"$dir/w"))
    // the gz twin over the same two records as two gzip members
    def member(rec: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(rec); gz.close(); bo.toByteArray
    }
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/g"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/g", "s0.warc.gz"),
      member(binRecord(1L, binPayload)) ++
        member(binRecord(2L, "plain text body".getBytes("UTF-8"))))
    check(Warc.readWarcGzBinary(spark, s"$dir/g"))
  }

  test("a record spanning many 64 KiB fill buffers is byte-identical through both doors (the resumed-scan iterators)") {
    // > 4 fills (the iterators' buffers are 64 KiB): a deterministic
    // ASCII pattern EMBEDDING 7-char sentinel PREFIXES ("WARC/1.")
    // every 7919 bytes — some land right at fill boundaries, so a
    // scan that resumes at the wrong offset (or a match test that
    // ignores the fill boundary) corrupts or splits the record
    val big = new Array[Byte](300 * 1024)
    var i = 0
    while (i < big.length) {
      big(i) = (if (i % 7919 < 7) "WARC/1.".charAt(i % 7919)
                else ('a' + i % 23).toChar).toByte
      i += 1
    }
    val dir = Files.createTempDirectory("warc_bigrec_").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/g"))
    def member(rec: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(rec); gz.close(); bo.toByteArray
    }
    // one gz shard: big record between two small ones, all in ONE
    // member so the inflate stream feeds the iterator in 64 KiB fills
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/g", "s0.warc.gz"),
      member(binRecord(1L, "head".getBytes("US-ASCII")) ++
        binRecord(2L, big) ++
        binRecord(3L, "tail".getBytes("US-ASCII"))))
    val gotBin = Warc.readWarcGzBinary(spark, s"$dir/g").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](3)).toMap
    assert(gotBin.keySet === Set("urn:graft:1", "urn:graft:2", "urn:graft:3"))
    assert(gotBin("urn:graft:2").toSeq === big.toSeq,
      "multi-fill record not byte-faithful through the binary door")
    assert(gotBin("urn:graft:1").toSeq === "head".getBytes("US-ASCII").toSeq)
    assert(gotBin("urn:graft:3").toSeq === "tail".getBytes("US-ASCII").toSeq)
    // the text door over the same shard: the payload is pure ASCII,
    // so the gz TEXT iterator must hand it back char-identical too
    val gotTxt = Warc.readWarcGz(spark, s"$dir/g").collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(gotTxt("urn:graft:2") === new String(big, "US-ASCII"),
      "multi-fill record not char-faithful through the gz text door")
  }

  test("the text door's non-UTF-8 mangling is the PINNED contract: detectable, never silent corruption passing as faithful") {
    val dir = Files.createTempDirectory("warc_bin_text_").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/w"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/w", "s0.warc"),
      binRecord(1L, binPayload))
    val row = Warc.readWarc(spark, s"$dir/w").collect().head
    // the scaladoc'd text-door behavior: replacement-char
    // substitution — the payload comes back changed AND carrying
    // U+FFFD, so a pipeline that accidentally routes binary records
    // through the text door sees the damage, not a quiet pass-through
    val textPayload = row.getString(3)
    assert(textPayload != null)
    assert(textPayload.getBytes("UTF-8").toSeq !== binPayload.toSeq,
      "a non-UTF-8 payload cannot survive the text door unchanged")
    assert(textPayload.contains('�'),
      "mangling must surface as replacement chars, not silent bytes")
    // and the binary door on the SAME shard is the faithful read
    val bin = Warc.readWarcBinary(spark, s"$dir/w").collect().head
    assert(bin.getAs[Array[Byte]](3).toSeq === binPayload.toSeq)
  }
}
