package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (beyond-reference north star): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / frame-sample run partition-wise over batches.
  *
  * The IMAGE path is real: `asPngMedia` renders an actual PNG per document
  * (dimensions and a corner-pixel color derived deterministically from the
  * text, so an external oracle can predict them), and `decodeFeatures` reads
  * it back through `javax.imageio` — width/height/pixel come from the codec,
  * not from a formula. Audio/video codecs are still stubs (this container has
  * no media libraries): any payload ImageIO cannot decode falls back to
  * deterministic pseudo-dimensions, clearly marked by `decoded = false`.
  *
  * At 100 TB: binary payloads stay columnar in parquet (never strings),
  * decode is embarrassingly parallel with no shuffle (one `mapPartitions`
  * pass — the batch shape a vectorized decoder needs), and metadata-only
  * queries prune the binary column entirely (columnar projection).
  */
object Multimodal {

  /** Decoded-feature schema: what a real image decode yields. `decoded` is
    * true when a real codec produced width/height/corner_rgb, false when the
    * stub fallback did; `corner_rgb` is the (0,0) pixel as 0xRRGGBB. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("content_hash", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("corner_rgb", IntegerType),
    StructField("decoded", BooleanType)))

  /** Wrap a text column as an opaque (non-image) media payload: binary
    * content + metadata struct. Decoding this goes through the stub path —
    * the shape an audio/video ingest would produce. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("video/fake").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("size")).as("media_meta"))

  /** Deterministic image geometry from a text length — the generation-side
    * contract an oracle replays: width in [16,79], height in [16,63]. */
  private def pngWidth(len: Int): Int = (len * 7) % 64 + 16
  private def pngHeight(len: Int): Int = (len * 13) % 48 + 16

  private def md5Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  /** Render each document as a REAL PNG: dimensions from the text length,
    * pixel (0,0) colored with the first 24 bits of md5(text), the rest a
    * gradient (so the zlib stream is non-trivial). One `mapPartitions` pass;
    * the payload is genuine image/png bytes any decoder can read. */
  def asPngMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("content", BinaryType),
        StructField("media_meta", StructType(Seq(
          StructField("mime", StringType),
          StructField("size", LongType)))))))
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { it =>
        ImageIO.setUseCache(false) // no temp-file cache inside executors
        it.map { row =>
          val id = row.getLong(0)
          val textBytes = row.getString(1).getBytes("UTF-8")
          val len = textBytes.length
          val (w, h) = (pngWidth(len), pngHeight(len))
          val corner = Integer.parseInt(md5Hex(textBytes).substring(0, 6), 16)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, ((x + y) * 37) & 0xffffff); x += 1 }
            y += 1
          }
          img.setRGB(0, 0, corner)
          val out = new ByteArrayOutputStream(1024)
          ImageIO.write(img, "png", out)
          val bytes = out.toByteArray
          Row(id, bytes, Row("image/png", bytes.length.toLong))
        }
      }(enc)
  }

  /** Decode media features in one partition-wise pass. Image payloads go
    * through `javax.imageio` — width/height/corner pixel are read from the
    * actual bytes (a PNG round-trip is lossless, so the corner color equals
    * what the encoder embedded). Payloads ImageIO cannot read (audio/video —
    * no codec in this container) take the STUB fallback: deterministic
    * pseudo-dimensions from the byte length, `decoded = false`. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    val projected = media.select(col("doc_id"), col("content"),
      col("media_meta.mime").as("mime"))
    projected.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val mime = row.getString(2)
        val len = bytes.length.toLong
        val hash = md5Hex(bytes)
        val img = if (mime != null && mime.startsWith("image/"))
          ImageIO.read(new ByteArrayInputStream(bytes)) else null
        if (img != null)
          Row(id, len, hash, img.getWidth, img.getHeight, 1,
            img.getRGB(0, 0) & 0xffffff, true)
        else // stub fallback: no codec for this modality in-container
          Row(id, len, hash,
            ((len * 7) % 640 + 1).toInt,
            ((len * 13) % 480 + 1).toInt,
            (len % 16 + 1).toInt,
            null, false)
      }
    }(enc)
  }

  /** Decoded-audio schema: header fields come from parsing the actual RIFF
    * container; `sum_sq` is the exact integer sum of squared PCM samples
    * (the RMS numerator) read from the data chunk — real feature
    * extraction, exact because it stays integral. */
  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("sum_sq", LongType),
    StructField("decoded", BooleanType)))

  /** Render each document as a REAL RIFF/WAVE payload (PCM16 LE mono).
    * Generation contract (what an external oracle replays): sample rate =
    * 8000 + (len%3)·4000, n_samples = len·20 + 100, sample i =
    * ((i·73 + id·7919) mod 4096) − 2048 — all integer, all deterministic.
    * One mapPartitions pass, no shuffle. */
  def asWavMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("content", BinaryType),
        StructField("media_meta", StructType(Seq(
          StructField("mime", StringType),
          StructField("size", LongType)))))))
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { it =>
        it.map { row =>
          val id = row.getLong(0)
          val len = row.getString(1).getBytes("UTF-8").length
          val sampleRate = 8000 + (len % 3) * 4000
          val nSamples = len * 20 + 100
          val dataSize = nSamples * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1)                     // PCM
            .putShort(1)                     // mono
            .putInt(sampleRate)
            .putInt(sampleRate * 2)          // byte rate
            .putShort(2)                     // block align
            .putShort(16)                    // bits/sample
            .put("data".getBytes("US-ASCII")).putInt(dataSize)
          var i = 0
          while (i < nSamples) {
            bb.putShort((((i * 73L + id * 7919L) % 4096L) - 2048L).toShort)
            i += 1
          }
          val bytes = bb.array()
          Row(id, bytes, Row("audio/wav", bytes.length.toLong))
        }
      }(enc)
  }

  /** Decode audio features partition-wise: walk the RIFF chunks of the
    * actual bytes ("fmt " → rate/channels/bits, "data" → PCM samples),
    * derive duration and the exact sum of squared samples. Payloads that
    * are not a parseable PCM16 WAV fall back to nulls with
    * `decoded = false` (same stub contract as [[decodeFeatures]]). */
  def decodeWavFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioSchema)
    media.select(col("doc_id"), col("content")).mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val fallback = Row(id, bytes.length.toLong, null, null, null, null,
          null, null, false)
        try {
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val riff = new String(bytes, 0, 4, "US-ASCII")
          val wave = new String(bytes, 8, 4, "US-ASCII")
          if (riff != "RIFF" || wave != "WAVE") fallback
          else {
            var pos = 12
            var rate = -1; var channels = -1; var bits = -1
            var dataOff = -1; var dataLen = -1
            while (pos + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
              val tag = new String(bytes, pos, 4, "US-ASCII")
              val sz = bb.getInt(pos + 4)
              if (tag == "fmt ") {
                channels = bb.getShort(pos + 10).toInt
                rate = bb.getInt(pos + 12)
                bits = bb.getShort(pos + 22).toInt
              } else if (tag == "data") { dataOff = pos + 8; dataLen = sz }
              pos += 8 + sz + (sz & 1) // chunks are word-aligned
            }
            if (rate <= 0 || dataOff < 0 || bits != 16 || channels != 1)
              fallback
            else {
              val n = dataLen / 2
              var sumSq = 0L
              var i = 0
              while (i < n) {
                val s = bb.getShort(dataOff + i * 2).toLong
                sumSq += s * s
                i += 1
              }
              Row(id, bytes.length.toLong, rate, channels, bits, n.toLong,
                n.toLong * 1000L / rate, sumSq, true)
            }
          }
        } catch { case _: Exception => fallback }
      }
    }(enc)
  }

  /** Frame sampling as byte-range slices: every `stride`-th chunk of
    * `frameBytes` — the plumbing shape of video frame extraction. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, greatest(int(octet_length(content) / ($frameBytes * $stride)) - 1, 0)), " +
        s"i -> substring(content, i * $frameBytes * $stride + 1, $frameBytes))")))
      .select(col("doc_id"), col("pos").as("frame_idx"),
        octet_length(col("col")).cast("int").as("frame_bytes"))
}
