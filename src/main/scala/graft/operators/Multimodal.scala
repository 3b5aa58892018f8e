package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns plus a typed metadata
  * struct; the decode step is a clearly-marked deterministic STUB (the
  * container has no codec libraries) while everything Spark-side —
  * schema, batching, partition-level iteration, output shapes — is real.
  *
  * The production swap-in point is [[FakeCodec]]: replace with JNI/javacv
  * bindings; the `mapPartitions` batching pattern (decode per partition,
  * reuse a codec instance across rows, emit typed rows) is exactly what a
  * real decoder needs, mirroring how Pandas-UDF `mapInPandas` pipelines
  * batch decode work in PySpark.
  */
object Multimodal {

  val mediaMetaStruct: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", mediaMetaStruct)))

  /** STUB codec: deterministic pure functions of the payload bytes
    * (md5-derived, so oracle-checkable from SQL). Replace with a real
    * decoder; signatures are the contract. */
  object FakeCodec {
    private def md5hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.isEmpty) "empty"
      else Seq("jpeg", "png", "wav", "mp4")(
        (java.lang.Long.parseLong(md5hex(bytes).substring(0, 2), 16) % 4).toInt)
    def dimensions(bytes: Array[Byte]): (Int, Int) = {
      val h = md5hex(bytes)
      val a = java.lang.Long.parseLong(h.substring(0, 8), 16)
      val b = java.lang.Long.parseLong(h.substring(8, 16), 16)
      ((64 + a % 1024).toInt, (64 + b % 1024).toInt)
    }
    def durationMs(bytes: Array[Byte]): Long = bytes.length.toLong * 10L
    /** "Decode" a frame at index i: deterministic byte slice. */
    def frame(bytes: Array[Byte], i: Int): Array[Byte] = {
      if (bytes.isEmpty) Array.emptyByteArray
      else {
        val start = (i * 7) % bytes.length
        java.util.Arrays.copyOfRange(bytes, start,
          math.min(start + 16, bytes.length))
      }
    }
    /** "Resize": deterministic downsample of the byte stream. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      bytes.zipWithIndex.collect { case (b, i) if i % 4 == 0 => b }.take(w * h)
  }

  /** Synthesize a media table from the documents table: payload = UTF-8
    * text bytes. Keeps the pipeline testable with driver data only. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("media"),
      lit(null).cast(mediaMetaStruct).as("meta"))

  /** Metadata extraction: mapPartitions batch over the binary column
    * (codec instance amortized per partition, not per row). */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(mediaSchema.fields.map {
      case f if f.name == "meta" => f.copy(nullable = true)
      case f => f
    })
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("media"), col("meta"))
      .mapPartitions { rows =>
        // per-partition codec init goes here in a real impl
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray
            else r.getAs[Array[Byte]](1)
          val (w, h) = FakeCodec.dimensions(bytes)
          Row(id, bytes, Row(FakeCodec.sniffFormat(bytes), w, h,
            FakeCodec.durationMs(bytes), bytes.length.toLong))
        }
      }(enc)
  }

  /** Frame sampling: one output row per sampled frame (UDTF shape). */
  def sampleFrames(media: DataFrame, everyN: Int = 4, maxFrames: Int = 3): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray
            else r.getAs[Array[Byte]](1)
          (0 until maxFrames).map(i => Row(id, i * everyN,
            FakeCodec.frame(bytes, i * everyN)))
        }
      }(enc)
  }
}
