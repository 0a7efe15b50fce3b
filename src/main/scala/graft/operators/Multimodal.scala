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

  /** 64-bit average-hash (aHash) of an image payload — the classic
    * perceptual fingerprint: decode, reduce to an 8×8 grid by
    * block-averaging luminance ((r+g+b)/3, exact integer sums — no
    * Graphics2D rescale, whose interpolation is implementation-
    * defined), then threshold each cell STRICTLY ABOVE the grid mean.
    * Bit k (row-major cell k) set ⇔ cell k brighter than the mean.
    * Perceptual property: scaling/re-encoding an image preserves the
    * hash (asserted by spec through the real resize path); near-dup
    * images land within a few bits — pair them with
    * [[Dedup.hammingPairs64]]. Non-image payloads (and unreadable
    * images) fall back to a deterministic byte fold — stub-grade like
    * [[decodeStub]], collision-prone only where no pixels exist. */
  def aHash64(payload: Array[Byte]): Long = {
    val img =
      if (isPng(payload) || isJpeg(payload))
        javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      else null
    if (img == null) {
      var f = 1125899906842597L
      var i = 0
      while (i < payload.length) { f = f * 31 + (payload(i) & 0xff); i += 1 }
      f
    } else {
      val w = img.getWidth; val h = img.getHeight
      val cells = new Array[Double](64)
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          // cell (cx, cy) covers pixel rows [cy*h/8, (cy+1)*h/8) etc. —
          // exact partition of the image for any w, h ≥ 8
          val x0 = cx * w / 8; val x1 = (cx + 1) * w / 8
          val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
          var sum = 0L; var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              n += 1; x += 1
            }
            y += 1
          }
          cells(cy * 8 + cx) = if (n == 0) 0d else sum.toDouble / (3d * n)
          cx += 1
        }
        cy += 1
      }
      val mean = cells.sum / 64d
      var hash = 0L; var k = 0
      while (k < 64) { if (cells(k) > mean) hash |= (1L << k); k += 1 }
      hash
    }
  }

  /** Deterministic 64-bit cell pattern for an id: groups of 4 ids
    * share a base pattern, and member m = id mod 4 flips m DISJOINT
    * planted bits, so pairwise Hamming distances inside a group are
    * exactly m₁+m₂: (0,1)=1 (0,2)=2 (0,3)=3 (1,2)=3 in, (1,3)=4
    * (2,3)=5 out at maxHamming=3 — a planted structure with both kept
    * and rejected pairs. Base bits come from the SimHash-style affine
    * FAMILY (bit k thresholds s·(7919k+7) + 104729k + 9973 mod P)
    * over a quadratically mixed group seed s = (g²·c₁ + g·c₂) mod P —
    * both nonlinearities are load-bearing: a single shared multiplier
    * in either g or k leaves Weyl-sequence structure (three-distance
    * theorem) that makes unrelated groups collide at Hamming ≤ 3.
    * Pure integer arithmetic, reproduced bit-exactly by the SQL
    * oracle. Group 0 (s = 0) is the documented degenerate case: an
    * all-black image, whose aHash is still exact. */
  def patternOf(id: Long): Long = {
    val gid = id / 4
    val gp = gid % 2147483647L
    val s = (gp * gp % 2147483647L * 2654435761L + gp * 40503L) % 2147483647L
    var pat = 0L
    var k = 0
    while (k < 64) {
      if ((s * (7919L * k + 7L) + 104729L * k + 9973L) % 2147483647L >= 1073741824L)
        pat |= (1L << k)
      k += 1
    }
    pat ^ patternMasks((id % 4).toInt)
  }

  /** Disjoint planted-flip masks for group members 0..3. */
  val patternMasks: Array[Long] = Array(
    0L, 1L << 5, (1L << 13) | (1L << 21), (1L << 29) | (1L << 37) | (1L << 45))

  /** Render a 64-bit pattern as a REAL 64×64 PNG: cell k (8×8 px,
    * row-major) white iff bit k set. [[aHash64]] recovers the pattern
    * bit-exactly (white cells sit above the grid mean, black below,
    * for any non-degenerate popcount), which is what lets a SQL
    * oracle verify a real encode→decode→hash pipeline by arithmetic
    * alone. */
  def patternPng(pat: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val k = (y / 8) * 8 + (x / 8)
        img.setRGB(x, y, if ((pat & (1L << k)) != 0) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media table of [[patternPng]] payloads for each id — encode runs
    * partition-parallel, like [[syntheticPngMedia]]. */
  def patternMedia(ids: DataFrame, idCol: String): DataFrame = {
    implicit val enc = Encoders.row(mediaSchema)
    ids.select(col(idCol).cast("long")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = patternPng(patternOf(id))
        Row(id, bytes, "image/png", Row("pattern", bytes.length.toLong))
      }
    }
  }

  /** (media_id, ahash) via partition-batched REAL decode — the only
    * shuffle-bound rows are 16 bytes each; the binary payloads never
    * move. Feed [[Dedup.hammingPairs64]] for image near-dup pairs. */
  def imageHashes(media: DataFrame): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { it =>
        it.map(r => (r.getLong(0), aHash64(r.getAs[Array[Byte]](1))))
      }.toDF("media_id", "ahash")
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
