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
