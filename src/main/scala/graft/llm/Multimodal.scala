package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-parallel.
  *
  * The container has no codec libraries, so the decode kernels are
  * STUBBED with a clearly-marked deterministic fake
  * (`StubDecoder`) — the Spark-side plumbing (schema, batching,
  * partition parallelism, metadata extraction) is real and tested. In
  * production, swap the Decoder for one backed by an actual codec; the
  * plan shape is unchanged. At 100 TB the decode runs inside
  * mapPartitions on the scan stage: no shuffle, no driver involvement,
  * one decoder instance per partition (not per row). */
object Multimodal {

  /** Typed metadata row for a media asset. */
  case class MediaMeta(id: Long, mime: String, nBytes: Long, contentHash: String)

  /** Decoded feature row (e.g. image embedding / audio features). */
  case class MediaFeatures(id: Long, features: Array[Float], nFrames: Int)

  /** Magic-number MIME sniffing on the leading bytes — pure expression,
    * runs in codegen over the binary column. */
  def sniffMime(bytes: Column): Column = {
    val head = upper(hex(substring(bytes, 1, 8)))
    when(head.startsWith("89504E47"), "image/png")
      .when(head.startsWith("FFD8FF"), "image/jpeg")
      .when(head.startsWith("47494638"), "image/gif")
      // RIFF is a container — the form type at bytes 9-12 decides:
      // WAVE → wav, WEBP → webp, AVI  → avi; unknown RIFF stays opaque
      .when(head.startsWith("52494646") &&
        upper(hex(substring(bytes, 9, 4))) === "57415645", "audio/wav")  // WAVE
      .when(head.startsWith("52494646") &&
        upper(hex(substring(bytes, 9, 4))) === "57454250", "image/webp") // WEBP
      .when(head.startsWith("52494646") &&
        upper(hex(substring(bytes, 9, 4))) === "41564920", "video/avi")  // AVI
      .when(head.startsWith("494433"), "audio/mpeg")  // ID3
      .when(substring(head, 9, 8) === "66747970", "video/mp4") // ....ftyp
      .otherwise("application/octet-stream")
  }

  /** Metadata projection over a binary column: byte length, MIME,
    * content hash — all codegen'd expressions. */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("mime", sniffMime(col(binCol)))
      .withColumn("content_hash", md5(col(binCol)))

  /** Pluggable decode kernel. Implementations must be Serializable:
    * they ship to executors once per task. */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): Array[Float]
    def frameCount(bytes: Array[Byte]): Int
    /** Re-encode at target dimensions (image resize / audio resample). */
    def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte]
  }

  /** STUB: deterministic fake decoder (no codec libs in this
    * container). Features are derived from the content's md5 so tests
    * are reproducible; a real deployment replaces only this object. */
  object StubDecoder extends Decoder {
    private def digest(bytes: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
    def decode(bytes: Array[Byte]): Array[Float] = {
      val h = digest(bytes)
      Array.tabulate(16)(i => ((h(i % h.length) & 0xff) - 128) / 128.0f)
    }
    def frameCount(bytes: Array[Byte]): Int = 1 + (bytes.length % 7)
    /** Deterministic fake: w*h pseudo-pixels streamed from the content
      * hash — size math and batching are real, the codec isn't. */
    def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val h = digest(bytes)
      Array.tabulate(width * height)(i => h(i % h.length))
    }
  }

  case class ResizedMedia(id: Long, width: Int, height: Int, content: Array[Byte])

  /** Partition-parallel resize — same plan shape as extractFeatures:
    * kernel per partition, streaming rows, no shuffle. */
  def resizeAll(spark: SparkSession, df: DataFrame, idCol: String, binCol: String,
                width: Int, height: Int,
                decoder: Decoder = StubDecoder): Dataset[ResizedMedia] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ResizedMedia(id, width, height, decoder.resize(bytes, width, height))
      })
  }

  /** Partition-parallel decode / feature-extract: the distributed
    * pattern for any per-asset kernel (resize, frame-sample,
    * spectrogram). One decoder per partition; rows stream through
    * without materializing the partition. */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                      binCol: String,
                      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          MediaFeatures(id, decoder.decode(bytes), decoder.frameCount(bytes))
        }
      }
  }

  /** Frame sampling plumbing: pick every `stride`-th frame index up to
    * `maxFrames` — index math is real, frame extraction is the stubbed
    * kernel. */
  def sampleFrameIndexes(nFrames: Column, stride: Int, maxFrames: Int): Column = {
    val n = nFrames.cast("long")
    // zero-frame assets sample NOTHING — greatest(n-1, 0) would ask for
    // frame 0 of an empty asset
    when(n <= 0, array().cast("array<bigint>"))
      .otherwise(slice(sequence(lit(0L), n - 1, lit(stride.toLong)), 1, maxFrames))
  }
}
