package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Runnable Structured Streaming demo: streams the events parquet
  * through the windowed aggregation and the stateful sessionizer.
  * `sbt "runMain graft.StreamDemo [sfDir]"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the file streaming source wants a directory; stage the single
    // parquet file into one
    val stage = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(stage.toString)
    // vintage-adaptive: ts arrives as either ns-long or timestamp[us]
    val raw = schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType => stream
      case org.apache.spark.sql.types.TimestampNTZType =>
        stream.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    }

    val hourly = Streams.hourlyEventCounts(raw)
      .writeStream.format("memory").queryName("hourly_demo")
      .outputMode("complete").start()
    hourly.processAllAvailable()
    println(s"hourly windows: ${spark.table("hourly_demo").count()}")
    spark.table("hourly_demo").orderBy("hour", "event_type").show(5)
    hourly.stop()

    val sessions = Streams.sessionize(
      raw.as[Streams.EventRow], gapMinutes = 30, watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions_demo")
      .outputMode("append").start()
    sessions.processAllAvailable()
    println(s"closed sessions: ${spark.table("sessions_demo").count()}")
    spark.table("sessions_demo").orderBy("user_id", "session_start").show(5)
    sessions.stop()
    spark.stop()
  }
}
