package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with typed metadata structs.
  * The Spark-side machinery — schemas, partition-batched processing,
  * column pruning — is real and tested; the codec step itself is a
  * clearly-marked deterministic STUB because no image/audio libraries
  * exist in this environment (build rules: stub the decode, keep the
  * plumbing real). At scale the decode stub is where a vectorized
  * batch decoder (or `mapInPandas` on PySpark) plugs in.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_length", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Real magic-number sniffing over the first bytes of the payload —
    * deterministic, pure column expressions. */
  def detectMime(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hexPrefix = upper(hex(substring(bin, 1, 4)))
    when(hexPrefix.startsWith("89504E47"), "image/png")
      .when(hexPrefix.startsWith("FFD8FF"), "image/jpeg")
      .when(hexPrefix.startsWith("47494638"), "image/gif")
      .when(hexPrefix.startsWith("52494646"), "audio/wav") // RIFF container
      .when(hexPrefix.startsWith("494433"), "audio/mpeg")  // ID3
      .when(hexPrefix.startsWith("1A45DFA3"), "video/webm")
      .otherwise("application/octet-stream")
  }

  /** Attach a metadata struct to a binary media column. Width/height
    * come from the decode stub (null for unknown codecs). */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      detectMime(col(binCol)).as("mime"),
      length(col(binCol)).cast("long").as("byte_length"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height")))

  /** STUB decode → feature vector. Deterministic fake: hashes fixed-size
    * byte blocks into a `dim`-length float vector. The real
    * implementation would decode pixels/samples here; signature, batch
    * shape and schema are what a codec integration needs.
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
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) {
            acc(i % dim) += (bytes(i) & 0xff) / 255.0f // ??? real decode here
            i += 1
          }
          val blocks = math.max(1, bytes.length / dim)
          var d = 0
          while (d < dim) { acc(d) /= blocks.toFloat; d += 1 }
        }
        // clone: Array.toSeq WRAPS the array (2.13 unsafeWrapArray) —
        // emitting the scratch buffer itself would let the next row's
        // mutation corrupt this row wherever the consumer buffers Rows
        Row.fromSeq(row.toSeq :+ acc.clone().toSeq)
      }
    }
  }

  /** STUB resize: emit a `resized` binary of exactly width×height bytes
    * by nearest-neighbor sampling the source payload — the
    * decode → resample → re-encode shape (and output contract: fixed
    * dimensions regardless of input size) of a real image resize,
    * without a codec. Partition-batched like [[extractFeatures]]. */
  def resizeStub(df: DataFrame, binCol: String, width: Int,
                 height: Int): DataFrame = {
    require(width > 0 && height > 0, "target dimensions must be positive")
    val outSchema = df.schema.add("resized", BinaryType)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val out = new Array[Byte](width * height)
        if (bytes != null && bytes.length > 0) {
          var i = 0
          while (i < out.length) {
            // ??? real decode + interpolation here
            out(i) = bytes((i.toLong * bytes.length / out.length).toInt)
            i += 1
          }
        }
        Row.fromSeq(row.toSeq :+ out)
      }
    }
  }

  /** STUB frame sampling: split the payload into `frameSize`-byte chunks
    * and keep every `stride`-th chunk — the partitioning/explode shape of
    * real video frame extraction. One row per (id, frame_no). */
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
