package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travel as
  * opaque `binary` columns with typed metadata alongside. The Spark
  * side — schema, partition-preserving batched decode, row shape — is
  * real; the codec itself is a stub ([[StubDecoder]]) because no media
  * libraries exist in this environment. A production deployment binds
  * [[BinaryDecoder]] to a real codec (JNI image lib, ffmpeg pipe, …)
  * without touching any of the plumbing.
  *
  * Scale notes: decode runs via `mapPartitions`, so one decoder
  * instance per partition (codecs are expensive to construct),
  * streaming through rows without materializing a partition in memory.
  * Binary payloads stay columnar until the decode boundary; metadata
  * extraction is column pruning friendly — downstream consumers that
  * only need metadata never deserialize payload bytes again.
  */
object Multimodal {

  /** Typed metadata produced by decoding one media payload. */
  final case class MediaMeta(
      id: Long, n_bytes: Long, width: Int, height: Int, format: String)

  /** One decoder instance per partition; implementations must be
    * serializable and construct lazily.
    */
  trait BinaryDecoder extends Serializable {
    def decode(id: Long, payload: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode — stands in for a real image codec
    * (`???` territory in this container). Derives plausible metadata
    * arithmetically from the payload so tests and oracles can verify
    * the plumbing end-to-end.
    */
  object StubDecoder extends BinaryDecoder {
    override def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaMeta(
        id = id,
        n_bytes = n,
        width = (1 + n % 512).toInt,
        height = (1 + (n * 7) % 512).toInt,
        format = (n % 3) match {
          case 0 => "png"
          case 1 => "jpeg"
          case _ => "webp"
        })
    }
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Decode a binary column to typed metadata, partition-batched. */
  def decodeMeta(
      df: DataFrame, idCol: String, binCol: String,
      decoder: BinaryDecoder = StubDecoder,
  ): DataFrame = {
    val session = df.sparkSession
    val projected = df.select(col(idCol).cast(LongType), col(binCol))
    val rows = projected.rdd.mapPartitions { it =>
      it.map { row =>
        val m = decoder.decode(row.getLong(0), row.getAs[Array[Byte]](1))
        Row(m.id, m.n_bytes, m.width, m.height, m.format)
      }
    }
    session.createDataFrame(rows, metaSchema)
  }

  /** Attach a synthetic binary payload column derived from text — the
    * testdata has no real media; this models the "media lake" input
    * shape (id, content bytes).
    */
  def withFakePayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))
}
