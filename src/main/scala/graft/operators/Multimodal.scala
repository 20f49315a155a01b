package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession, functions => F}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs
  * executor-local over `mapPartitions` with a pluggable decoder, so the
  * Spark side (schema, batching, partitioning) is real and tested even
  * though this container has no image/audio codecs.
  *
  * STUB NOTE: `StubDecoder` below is a deterministic fake — it parses
  * nothing, it derives metadata and a fixed-length feature vector from
  * the raw bytes. Swap in a real codec (JNI image lib, ffmpeg pipe, …)
  * by implementing `MediaDecoder`; every other line stays unchanged.
  */
object Multimodal {

  /** Decoded media metadata + features. */
  case class MediaFeatures(
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      features: Array[Float])

  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake decoder: byte statistics instead of pixels. */
  object StubDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): MediaFeatures = {
      if (bytes == null || bytes.isEmpty)
        return MediaFeatures(0L, "empty", 0, 0, Array.fill(8)(0.0f))
      // "format" sniffing from magic bytes, as a real decoder would
      val format =
        if (bytes.length > 3 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
        else if (bytes.length > 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
        else "raw"
      // deterministic pseudo-dimensions from content hash
      val h = Dedup.mix64(bytes.foldLeft(0xcbf29ce484222325L)((a, b) => (a ^ b) * 0x100000001b3L))
      val width = 64 + (math.abs(h) % 512).toInt
      val height = 64 + (math.abs(h >>> 20) % 512).toInt
      // 8 "features": chunked byte means normalized to [0,1]
      val chunk = math.max(1, bytes.length / 8)
      val feats = Array.tabulate(8) { i =>
        val from = i * chunk
        val to = math.min(bytes.length, from + chunk)
        if (from >= bytes.length) 0.0f
        else {
          var s = 0L
          var j = from
          while (j < to) { s += (bytes(j) & 0xFF); j += 1 }
          (s.toDouble / ((to - from) * 255.0)).toFloat
        }
      }
      MediaFeatures(bytes.length.toLong, format, width, height, feats)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Decode a binary column into metadata + features, executor-local.
    * Output: all input columns except the binary payload, plus the
    * feature struct fields. The decoder runs as a struct-returning scalar
    * UDF, so the plan stays inside whole-stage codegen (no RDD
    * round-trip) and partitioning is preserved — no shuffle. */
  def extractFeatures(df: DataFrame, binCol: String,
                      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val dec = decoder
    val decodeUdf = F.udf((bytes: Array[Byte]) => dec.decode(bytes))
    val kept = df.columns.filterNot(_ == binCol).map(F.col)
    df.withColumn("__media", decodeUdf(F.col(binCol)))
      .select((kept :+ F.col("__media.*")).toIndexedSeq: _*)
  }
}
