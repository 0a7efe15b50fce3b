package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, with decode / feature-extract
  * running batched inside `mapPartitions`.
  *
  * The actual media decode is STUBBED (this container has no image /
  * audio codecs): `decodeStub` derives deterministic fake features
  * from the bytes. Everything Spark-side — the binary schema, the
  * partition-wise batching, the output schema contract — is real, so
  * swapping the stub for a JNI/ffmpeg/JPEG decoder changes one
  * function. At scale: binary payloads stay columnar in parquet, the
  * decode is embarrassingly parallel, and feature extraction happens
  * before any shuffle so only small feature vectors move.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("byte_len", LongType))))))

  /** Wrap a text table into the media shape (test stand-in for real
    * blobs): payload = utf-8 bytes. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      struct(col(sourceCol).as("source"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len")).as("meta"))

  /** STUB decoder: deterministic pseudo-features of a payload. A real
    * implementation decodes pixels/samples here; the signature — bytes
    * in, fixed-width feature row out — is what a codec integration
    * must satisfy. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Double) = {
    val len = payload.length
    val checksum = payload.foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) & 0x7fffffffL)
    val width = 64 + (checksum % 577).toInt   // fake dimensions
    val height = 64 + (checksum % 431).toInt
    (width, height, len.toDouble / math.max(width * height, 1))
  }

  /** STUB resize: a real implementation decodes, scales, re-encodes;
    * the stub slices the payload proportionally so output size tracks
    * the requested scale deterministically. Signature — (bytes, w, h)
    * → bytes — is the codec contract. */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val (w, h, _) = decodeStub(payload)
    val ratio = math.min(1.0, (targetW.toLong * targetH).toDouble / (w.toLong * h))
    java.util.Arrays.copyOfRange(payload, 0, math.max(1, (payload.length * ratio).toInt))
  }

  /** Frame sampling: one payload → up to `n` evenly-spaced "frame"
    * payloads, exploded to one row each (the Spark-side shape of video
    * sampling: fan-out happens before any shuffle, so downstream
    * per-frame feature extraction parallelizes). Frames are stubbed as
    * deterministic payload slices. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("frame_idx", IntegerType),
      StructField("frame_payload", BinaryType)))
    implicit val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val k = math.min(n, math.max(1, bytes.length))
      (0 until k).iterator.map { i =>
        val start = (bytes.length.toLong * i / k).toInt
        val end = (bytes.length.toLong * (i + 1) / k).toInt
        Row(id, i, java.util.Arrays.copyOfRange(bytes, start, math.max(end, start + 1)))
      }
    }
  }

  /** Partition-batched "decode": one pass per partition, no shuffle.
    * Output: (media_id, byte_len, width, height, density). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("byte_len", LongType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("density", DoubleType)))
    implicit val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, d) = decodeStub(bytes)
        Row(id, bytes.length.toLong, w, h, d)
      }
    }
  }
}
