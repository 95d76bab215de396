package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-measurement for the WARC record iterators on LARGE members
  * (the binary door's reason to exist): stages one plain shard and
  * one single-member gz shard, each holding a `sizeMb` record plus
  * two small ones, and times the two doors. `sbt "runMain
  * graft.tools.WarcBigMember [sizeMb]"`. The interesting number is
  * how the seconds scale with sizeMb: linear for the resumed-scan
  * iterators, quadratic for a from-zero rescan (the r20 shape).
  */
object WarcBigMember {
  def main(args: Array[String]): Unit = {
    val sizeMb = args.headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val big = new Array[Byte](sizeMb * 1024 * 1024)
    var i = 0
    while (i < big.length) {
      big(i) = (if (i % 7919 < 7) "WARC/1.".charAt(i % 7919)
                else ('a' + i % 23).toChar).toByte
      i += 1
    }
    def rec(id: Long, body: Array[Byte]): Array[Byte] =
      ((graft.sources.Warc.RecordSentinel +
        "WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:graft:$id>\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
        ++ body ++ "\r\n\r\n".getBytes("US-ASCII"))
    val dir = java.nio.file.Files.createTempDirectory("warc_big_")
    val shard = rec(1, "h".getBytes) ++ rec(2, big) ++ rec(3, "t".getBytes)
    java.nio.file.Files.createDirectories(dir.resolve("w"))
    java.nio.file.Files.write(dir.resolve("w/s0.warc"), shard)
    val bo = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(shard); gz.close()
    java.nio.file.Files.createDirectories(dir.resolve("g"))
    java.nio.file.Files.write(dir.resolve("g/s0.warc.gz"), bo.toByteArray)
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$tag%-14s sizeMb=$sizeMb rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    for (_ <- 1 to 2) {
      time("binary-plain") {
        graft.sources.Warc.readWarcBinary(spark, dir.resolve("w").toString).count()
      }
      time("binary-gz") {
        graft.sources.Warc.readWarcGzBinary(spark, dir.resolve("g").toString).count()
      }
      time("text-gz") {
        graft.sources.Warc.readWarcGz(spark, dir.resolve("g").toString).count()
      }
    }
    spark.stop()
  }
}
