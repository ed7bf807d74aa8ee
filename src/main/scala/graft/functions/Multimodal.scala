package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (beyond-reference north star): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / frame-sample run partition-wise over batches.
  *
  * The actual media codecs are STUBBED (`decodeStub`) — this container has no
  * image/audio libraries — but everything Spark-side is real: the schema
  * contract, the `mapPartitions` batch shape (one iterator pass, no
  * per-row JNI-style setup cost when a real codec is plugged in), and the
  * deterministic metadata derivation the tests + oracle verify.
  *
  * At 100 TB: binary payloads stay columnar in parquet (never strings),
  * decode is embarrassingly parallel with no shuffle, and metadata-only
  * queries prune the binary column entirely (columnar projection).
  */
object Multimodal {

  /** Decoded-feature schema: what a real image decode would yield. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("content_hash", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap a text column as a fake media payload: binary content + metadata
    * struct (the schema a real ingest would produce). */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("image/fake").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("size")).as("media_meta"))

  /** STUB decode: a real implementation would hand `content` to a codec per
    * batch. The stub derives deterministic pseudo-dimensions from the bytes
    * so the pipeline is testable end-to-end. Runs as one `mapPartitions`
    * pass — the batch shape a vectorized decoder needs. */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    val projected = media.select(col("doc_id"), col("content"))
    projected.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val len = bytes.length.toLong
        md.reset()
        val hash = md.digest(bytes).map("%02x".format(_)).mkString
        Row(id, len, hash,
          ((len * 7) % 640 + 1).toInt,
          ((len * 13) % 480 + 1).toInt,
          (len % 16 + 1).toInt)
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
