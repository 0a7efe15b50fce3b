package graft.operators

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, with decode / feature-extract
  * running batched inside `mapPartitions`.
  *
  * Image decode is REAL for PNG/JPEG payloads (JDK `javax.imageio` —
  * no external dependency, headless-safe): `decode` sniffs the magic
  * bytes and reads true pixel dimensions. Payloads that aren't a
  * supported image (e.g. audio/video — this container has no such
  * codecs) fall back to `decodeStub`, a deterministic fake that keeps
  * the pipeline shape testable. Everything Spark-side — the binary
  * schema, the partition-wise batching, the output schema contract —
  * is the real design: binary payloads stay columnar in parquet, the
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

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  /** Decode a payload to (width, height, density). PNG/JPEG payloads
    * (sniffed by magic bytes) are decoded for real with JDK ImageIO;
    * anything else falls back to [[decodeStub]]. Density = bytes per
    * pixel — a cheap compressibility signal for image-quality filters. */
  def decode(payload: Array[Byte]): (Int, Int, Double) =
    if (isPng(payload) || isJpeg(payload)) {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) decodeStub(payload)
      else (img.getWidth, img.getHeight,
        payload.length.toDouble / math.max(img.getWidth.toLong * img.getHeight, 1L))
    } else decodeStub(payload)

  /** STUB decoder for non-image payloads: deterministic pseudo-features.
    * The checksum folds the payload's UTF-8-decoded code points —
    * (a·131 + cp) mod 2³¹, left-to-right — so the same fold is
    * reproducible in the DuckDB oracle (`list_reduce` over
    * `unicode(char)`), making even the stubbed path hash-checkable.
    * Known limit of the codepoint contract: bytes that are invalid
    * UTF-8 collapse to U+FFFD before the fold, so two corrupt binary
    * payloads can share a checksum where a byte-level fold would not —
    * acceptable for a stub whose only promise is determinism, and the
    * price of oracle reproducibility (DuckDB folds code points, not
    * bytes). Real image payloads never reach this path ([[decode]]
    * tries ImageIO first). */
  def decodeStub(payload: Array[Byte]): (Int, Int, Double) = {
    val s = new String(payload, StandardCharsets.UTF_8)
    var checksum = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      checksum = (checksum * 131 + cp) % 2147483648L
    }
    val width = 64 + (checksum % 577).toInt   // fake dimensions
    val height = 64 + (checksum % 431).toInt
    (width, height, payload.length.toDouble / math.max(width * height, 1))
  }

  /** Resize. Real path for PNG/JPEG: decode, scale with a bilinear
    * Graphics2D transform, re-encode as PNG. Non-image payloads keep
    * the deterministic stub (proportional byte slice). */
  def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] =
    resizeTagged(payload, targetW, targetH)._1

  /** [[resize]] plus whether the real re-encode path ran — the output
    * of that path is ALWAYS PNG bytes regardless of the input format,
    * so callers carrying a mime column must relabel (a JPEG input
    * would otherwise come back as PNG bytes labeled image/jpeg). */
  private def resizeTagged(payload: Array[Byte], targetW: Int,
                           targetH: Int): (Array[Byte], Boolean) =
    if (isPng(payload) || isJpeg(payload)) {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) (resizeStub(payload, targetW, targetH), false)
      else {
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        (bos.toByteArray, true)
      }
    } else (resizeStub(payload, targetW, targetH), false)

  /** STUB resize for non-image payloads: slices the payload
    * proportionally so output size tracks the requested scale
    * deterministically. Signature — (bytes, w, h) → bytes — is the
    * codec contract. */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val (w, h, _) = decodeStub(payload)
    val ratio = math.min(1.0, (targetW.toLong * targetH).toDouble / (w.toLong * h))
    java.util.Arrays.copyOfRange(payload, 0, math.max(1, (payload.length * ratio).toInt))
  }

  /** Deterministic synthetic PNG: gray(x,y) = (x·31 + y·17 + seed)
    * mod 256. Used to exercise the REAL ImageIO decode path end-to-end
    * with dimensions an oracle can predict arithmetically. */
  def makePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = ((x * 31 + y * 17 + seed) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Build a media table of real PNG payloads whose dimensions are a
    * pure function of the id — (widthOf, heightOf) — so a SQL oracle
    * can verify the decoded dimensions without decoding. Encode runs
    * partition-parallel before any shuffle. */
  def syntheticPngMedia(ids: DataFrame, idCol: String,
                        widthOf: Long => Int, heightOf: Long => Int): DataFrame = {
    implicit val enc = Encoders.row(mediaSchema)
    ids.select(col(idCol).cast("long")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = makePng(widthOf(id), heightOf(id), id)
        Row(id, bytes, "image/png", Row("synthetic", bytes.length.toLong))
      }
    }
  }

  /** Partition-batched resize of a media table: each payload is resized
    * to (widthOf(id), heightOf(id)) — real re-encode for images, stub
    * slice otherwise — with `meta.byte_len` updated to the new payload
    * size and `mime` set to image/png when the real path re-encoded
    * (the stub slice keeps its original label). No shuffle: the
    * transform is embarrassingly parallel and runs where the payload
    * already lives. */
  def resizeMedia(media: DataFrame,
                  widthOf: Long => Int, heightOf: Long => Int): DataFrame = {
    implicit val enc = Encoders.row(mediaSchema)
    media.select(col("media_id"), col("payload"), col("mime"), col("meta"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val (out, reEncoded) =
            resizeTagged(r.getAs[Array[Byte]](1), widthOf(id), heightOf(id))
          val mime = if (reEncoded) "image/png" else r.getString(2)
          Row(id, out, mime, Row(r.getStruct(3).getString(0), out.length.toLong))
        }
      }
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

  /** Partition-batched decode: one pass per partition, no shuffle.
    * Output: (media_id, byte_len, width, height, density). PNG/JPEG
    * payloads get REAL decoded dimensions; others the deterministic
    * stub. */
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
        val (w, h, d) = decode(bytes)
        Row(id, bytes.length.toLong, w, h, d)
      }
    }
  }
}
