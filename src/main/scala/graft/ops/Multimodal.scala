package graft.ops

import java.awt.image.BufferedImage

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with typed metadata structs.
  * Metadata (mime, dimensions) is parsed from container HEADERS with
  * pure column expressions — at 100 TB you never decode pixels to learn
  * a width. Pixel operations (resize, feature extraction) decode for
  * real via `javax.imageio` (JDK-native PNG/JPEG/GIF/BMP codecs — no
  * external jar) inside partition-batched `mapPartitions`; payloads the
  * JDK cannot decode (audio/video/opaque blobs) fall back to a
  * deterministic byte-resample with the same output contract, so the
  * pipeline shape is identical whichever branch a row takes. At scale
  * the decode branch is where a vectorized batch decoder for further
  * codecs plugs in.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_length", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType)))

  /** Real magic-number sniffing over the first bytes of the payload —
    * deterministic, pure column expressions. RIFF containers are
    * discriminated by their form type at byte 9 (WAVE vs "AVI ") —
    * "RIFF" alone names the envelope, not the medium. */
  def detectMime(bin: Column): Column = {
    val hexPrefix = upper(hex(substring(bin, 1, 4)))
    val riffForm = upper(hex(substring(bin, 9, 4)))
    when(hexPrefix.startsWith("89504E47"), "image/png")
      .when(hexPrefix.startsWith("FFD8FF"), "image/jpeg")
      .when(hexPrefix.startsWith("47494638"), "image/gif")
      // "BM" alone is only 2 bytes — require the 4 reserved zero bytes
      // at offset 6 too, or text beginning "BM…" would sniff as bmp
      .when(hexPrefix.startsWith("424D") &&
        upper(hex(substring(bin, 7, 4))) === "00000000", "image/bmp")
      .when(hexPrefix.startsWith("52494646") && // RIFF container
        riffForm === "57415645", "audio/wav")   // "WAVE"
      .when(hexPrefix.startsWith("52494646") &&
        riffForm === "41564920", "video/x-msvideo") // "AVI "
      .when(hexPrefix.startsWith("494433"), "audio/mpeg")  // ID3
      .when(hexPrefix.startsWith("1A45DFA3"), "video/webm")
      // ISO BMFF: size (4 bytes), "ftyp", then the major brand — like
      // RIFF, "ftyp" names the envelope, not the medium; the brand
      // carries the medium (M4A audio, HEIC/AVIF images, else video).
      // riffForm is the same bytes-9-12 slice both containers key on.
      // mif1/msf1 are HEIF structural brands several encoders write as
      // the MAJOR brand with heic only in compatible-brands.
      .when(upper(hex(substring(bin, 5, 4))) === "66747970",
        when(riffForm === "4D344120", "audio/mp4")            // "M4A "
          .when(upper(hex(substring(bin, 9, 3))) === "686569", "image/heic") // "hei*"
          .when(riffForm === "6D696631", "image/heif")          // "mif1"
          .when(riffForm === "6D736631", "image/heif-sequence") // "msf1"
          .when(riffForm === "61766966", "image/avif")        // "avif"
          .when(riffForm === "61766973", "image/avif-sequence") // "avis"
          .when(riffForm === "71742020", "video/quicktime")   // "qt  "
          .otherwise("video/mp4"))
      .otherwise("application/octet-stream")
  }

  /** Guarded narrowing: 4-byte unsigned fields can exceed Int.MaxValue
    * in hostile/corrupt headers, and an ANSI cast would THROW — one bad
    * file must not kill a corpus scan; unparseable means null. */
  private def toIntOrNull(unsigned: Column): Column = {
    val v = unsigned.cast("long")
    when(v <= Int.MaxValue, v.cast("int"))
  }

  /** Big-endian unsigned int from `len` bytes at 1-indexed `pos`. */
  private def beInt(bin: Column, pos: Int, len: Int): Column =
    toIntOrNull(conv(hex(substring(bin, pos, len)), 16, 10))

  /** Little-endian unsigned short from 2 bytes at 1-indexed `pos`. */
  private def leShort(bin: Column, pos: Int): Column =
    conv(concat(hex(substring(bin, pos + 1, 1)),
      hex(substring(bin, pos, 1))), 16, 10).cast("int")

  /** Image width parsed from the container header — no decode: PNG
    * IHDR (big-endian at byte 17), GIF logical screen (little-endian
    * at byte 7), BMP info header (little-endian at byte 19, 4 bytes)
    * as pure column expressions; JPEG via the bounded SOF-marker scan
    * of [[graft.functions.JpegDimsExpr]] (variable-offset segment
    * walk — a codegen'd custom expression, since fixed-offset
    * substring algebra can't express it). Each fixed-offset branch
    * also requires the payload to REACH its field's end offset:
    * substring past the end returns the available bytes and conv()
    * would read a truncated slice as a small fabricated integer —
    * unparseable must mean null (the JPEG kernel bounds-checks
    * internally). */
  def headerWidth(bin: Column): Column =
    when(detectMime(bin) === "image/png" && length(bin) >= 20,
      beInt(bin, 17, 4))
      .when(detectMime(bin) === "image/gif" && length(bin) >= 8,
        leShort(bin, 7))
      .when(detectMime(bin) === "image/bmp" && length(bin) >= 22,
        toIntOrNull(conv(concat(hex(substring(bin, 22, 1)),
          hex(substring(bin, 21, 1)), hex(substring(bin, 20, 1)),
          hex(substring(bin, 19, 1))), 16, 10)))
      .when(detectMime(bin) === "image/jpeg",
        shiftright(graft.functions.JpegDimsExpr.jpegDims(bin), 32).cast("int"))
      .otherwise(lit(null).cast("int"))

  /** Image height from the container header; see [[headerWidth]]. */
  def headerHeight(bin: Column): Column =
    when(detectMime(bin) === "image/png" && length(bin) >= 24,
      beInt(bin, 21, 4))
      .when(detectMime(bin) === "image/gif" && length(bin) >= 10,
        leShort(bin, 9))
      .when(detectMime(bin) === "image/bmp" && length(bin) >= 26,
        toIntOrNull(conv(concat(hex(substring(bin, 26, 1)),
          hex(substring(bin, 25, 1)), hex(substring(bin, 24, 1)),
          hex(substring(bin, 23, 1))), 16, 10)))
      .when(detectMime(bin) === "image/jpeg",
        graft.functions.JpegDimsExpr.jpegDims(bin)
          .bitwiseAND(lit(0xffffffffL)).cast("int"))
      .otherwise(lit(null).cast("int"))

  /** Little-endian unsigned int from 4 bytes at 1-indexed `pos`. */
  private def leInt(bin: Column, pos: Int): Column =
    toIntOrNull(conv(concat(hex(substring(bin, pos + 3, 1)),
      hex(substring(bin, pos + 2, 1)), hex(substring(bin, pos + 1, 1)),
      hex(substring(bin, pos, 1))), 16, 10))

  /** Canonical WAV layout guard: RIFF/WAVE with the "fmt " chunk first
    * (byte 13) and the payload reaching the sample-rate field. The
    * canonical layout covers virtually every real WAV; non-canonical
    * chunk orders null out rather than misread (same unparseable ⇒
    * null rule as the image headers). */
  private def isCanonicalWav(bin: Column): Column =
    detectMime(bin) === "audio/wav" && length(bin) >= 28 &&
      upper(hex(substring(bin, 13, 4))) === "666D7420" // "fmt "

  /** Audio sample rate (Hz) from the canonical WAV fmt chunk
    * (little-endian at byte 25) — header-parsed, no decode. */
  def headerSampleRate(bin: Column): Column =
    when(isCanonicalWav(bin), leInt(bin, 25))
      .otherwise(lit(null).cast("int"))

  /** Audio channel count from the canonical WAV fmt chunk
    * (little-endian at byte 23). */
  def headerChannels(bin: Column): Column =
    when(isCanonicalWav(bin), leShort(bin, 23))
      .otherwise(lit(null).cast("int"))

  /** Attach a metadata struct to a binary media column. Width/height
    * are header-parsed (PNG/GIF/BMP fixed offsets, JPEG SOF scan),
    * sample_rate/channels from the canonical WAV fmt chunk; null for
    * fields a payload's container doesn't carry or that can't be
    * parsed. */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      detectMime(col(binCol)).as("mime"),
      length(col(binCol)).cast("long").as("byte_length"),
      headerWidth(col(binCol)).as("width"),
      headerHeight(col(binCol)).as("height"),
      headerSampleRate(col(binCol)).as("sample_rate"),
      headerChannels(col(binCol)).as("channels")))

  // ImageIO defaults to a DISK cache: every read/write round-trips a
  // temp file — one create/write/delete per ROW in the mapPartitions
  // hot loops below, and a /tmp-exhaustion hazard at corpus scale.
  // Static JVM-wide switch, set once.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decode an image payload with the JDK-native codecs (PNG/JPEG/GIF/
    * BMP/WBMP). None for null/empty/undecodable payloads — the caller's
    * fallback branch handles those. Catches all non-fatal throwables:
    * the JDK readers throw unchecked exceptions (not just IOException)
    * on corrupt bodies behind valid magic numbers, and a hostile
    * payload must take the fallback, not kill the job. */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic bilinear resample to w×h (half-pixel-center source
    * mapping, edge clamp): hand-rolled over `getRGB` so the result is a
    * pure function of the decoded pixels — `Graphics2D` interpolation
    * goes through the platform rendering pipeline and is not
    * bit-reproducible across JVMs/platforms. */
  def bilinearResize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val sw = img.getWidth
    val sh = img.getHeight
    val src = img.getRGB(0, 0, sw, sh, null, 0, sw)
    val dst = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val fy = (y + 0.5) * sh / h - 0.5
      val y0 = math.min(sh - 1, math.max(0, math.floor(fy).toInt))
      val y1 = math.min(sh - 1, y0 + 1)
      val wy = math.min(1.0, math.max(0.0, fy - y0))
      var x = 0
      while (x < w) {
        val fx = (x + 0.5) * sw / w - 0.5
        val x0 = math.min(sw - 1, math.max(0, math.floor(fx).toInt))
        val x1 = math.min(sw - 1, x0 + 1)
        val wx = math.min(1.0, math.max(0.0, fx - x0))
        var px = 0xff000000
        var shift = 0
        while (shift < 24) { // blend R, G, B channels independently
          val c00 = (src(y0 * sw + x0) >>> shift) & 0xff
          val c01 = (src(y0 * sw + x1) >>> shift) & 0xff
          val c10 = (src(y1 * sw + x0) >>> shift) & 0xff
          val c11 = (src(y1 * sw + x1) >>> shift) & 0xff
          val top = c00 + (c01 - c00) * wx
          val bot = c10 + (c11 - c10) * wx
          val v = math.round(top + (bot - top) * wy).toInt
          px |= (math.min(255, math.max(0, v)) << shift)
          shift += 8
        }
        dst(y * w + x) = px
        x += 1
      }
      y += 1
    }
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    out.setRGB(0, 0, w, h, dst, 0, w)
    out
  }

  /** PNG-encode (lossless — the resize output must survive a
    * write/read round trip bit-exactly; JPEG would re-quantize). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode → feature vector. Decodable images yield grid-cell mean
    * luminance (the image split into `dim` horizontal bands of pixels,
    * mean Rec.601 luma per band, scaled to [0,1]); other payloads fall
    * back to byte-block means with the same shape. Deterministic either
    * way.
    *
    * Runs partition-batched via mapPartitions (the JVM analogue of a
    * pandas-batched UDF): one buffer allocation per partition, streaming
    * iterator, no per-row setup cost. */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 16): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val acc = new Array[Float](dim) // per-partition scratch buffer
      rows.map { row =>
        java.util.Arrays.fill(acc, 0.0f)
        val bytes = row.getAs[Array[Byte]](binIdx)
        decodeImage(bytes) match {
          case Some(img) =>
            val w = img.getWidth
            val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val counts = new Array[Int](dim)
            var i = 0
            while (i < px.length) {
              val cell = (i.toLong * dim / px.length).toInt
              val r = (px(i) >>> 16) & 0xff
              val g = (px(i) >>> 8) & 0xff
              val b = px(i) & 0xff
              acc(cell) += (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
              counts(cell) += 1
              i += 1
            }
            var d = 0
            while (d < dim) {
              if (counts(d) > 0) acc(d) /= counts(d)
              d += 1
            }
          case None if bytes != null =>
            var i = 0
            while (i < bytes.length) {
              acc(i % dim) += (bytes(i) & 0xff) / 255.0f
              i += 1
            }
            val blocks = math.max(1, bytes.length / dim)
            var d = 0
            while (d < dim) { acc(d) /= blocks.toFloat; d += 1 }
          case None => () // null payload -> zero vector
        }
        // clone: Array.toSeq WRAPS the array (2.13 unsafeWrapArray) —
        // emitting the scratch buffer itself would let the next row's
        // mutation corrupt this row wherever the consumer buffers Rows
        Row.fromSeq(row.toSeq :+ acc.clone().toSeq)
      }
    }
  }

  /** Resize: decodable images go decode → deterministic bilinear →
    * PNG re-encode (a real w×h image comes out); opaque payloads get a
    * deterministic nearest-neighbor byte resample to exactly
    * width×height bytes — same fixed-output-size contract, so
    * downstream batching never depends on which branch a row took.
    * Partition-batched like [[extractFeatures]]. */
  def resize(df: DataFrame, binCol: String, width: Int,
             height: Int): DataFrame = {
    require(width > 0 && height > 0, "target dimensions must be positive")
    val outSchema = df.schema.add("resized", BinaryType)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val out = decodeImage(bytes) match {
          case Some(img) => encodePng(bilinearResize(img, width, height))
          case None =>
            val fallback = new Array[Byte](width * height)
            if (bytes != null && bytes.length > 0) {
              var i = 0
              while (i < fallback.length) {
                fallback(i) = bytes((i.toLong * bytes.length / fallback.length).toInt)
                i += 1
              }
            }
            fallback
        }
        Row.fromSeq(row.toSeq :+ out)
      }
    }
  }

  /** Frame sampling: split the payload into `frameSize`-byte chunks and
    * keep every `stride`-th chunk — the partitioning/explode shape of
    * video frame extraction (a codec integration swaps byte chunks for
    * decoded frames; the plumbing — one row per (id, frame_no), pure
    * column algebra, no driver state — is the part that matters at
    * scale). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameSize: Int = 1024, stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col(binCol)).cast("double") / frameSize).cast("int")
    df.select(col(idCol), col(binCol),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))).as("frame_no"))
      .filter(col("frame_no") % stride === 0)
      .select(col(idCol), col("frame_no"),
        col(binCol).substr(col("frame_no") * frameSize + 1, lit(frameSize))
          .as("frame_bytes"))
  }
}
