package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-parallel.
  *
  * Decode kernels, by honesty class:
  *  - IMAGE decode/resize is REAL ([[ImageIoDecoder]]) — the JDK ships
  *    PNG/JPEG/GIF/BMP codecs in `javax.imageio` (headless-safe, zero
  *    external dependencies), so features, frame counts (animated GIF
  *    included) and resizes operate on actual pixels.
  *  - WAV (PCM) audio decode is REAL ([[WavDecoder]]) via
  *    `javax.sound.sampled`: real frame counts and amplitude features.
  *    Resampling is NOT in the JDK, so WavDecoder.resize refuses
  *    loudly rather than faking it.
  *  - Compressed audio (mp3) and video have no JDK codecs and no libs
  *    in this container — [[StubDecoder]] remains for those, clearly
  *    marked, deterministic for tests.
  * The Spark-side plumbing (schema, batching, partition parallelism,
  * metadata extraction) is identical for all three; swapping the
  * kernel never changes the plan shape. At 100 TB the decode runs
  * inside mapPartitions on the scan stage: no shuffle, no driver
  * involvement, one decoder instance per partition (not per row). */
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

  /** STUB: deterministic fake decoder for the modalities the JDK has
    * no codec for (compressed audio, video) — images use the REAL
    * [[ImageIoDecoder]] and PCM WAV the REAL [[WavDecoder]]. Features
    * are derived from the content's md5 so tests are reproducible; a
    * real deployment replaces only this object. */
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

  /** REAL image decode via the JDK's own codecs (`javax.imageio`:
    * PNG/JPEG/GIF/BMP; headless-safe). Corrupt or non-image bytes
    * yield empty features / frame count 0 — at corpus scale a bad
    * asset must be a skippable row, never a task failure.
    *
    * Features (8 floats): width, height, bands, aspect, mean R/G/B,
    * mean luma — exact integer pixel sums divided once, so a given
    * asset always produces the same vector. */
  object ImageIoDecoder extends Decoder {
    private def read(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    def decode(bytes: Array[Byte]): Array[Float] = read(bytes) match {
      case None => Array.empty
      case Some(img) =>
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Array(w.toFloat, h.toFloat, img.getRaster.getNumBands.toFloat,
          w.toFloat / h, (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
          (sb.toDouble / n).toFloat,
          ((sr * 299L + sg * 587L + sb * 114L).toDouble / (n * 1000L)).toFloat)
    }

    /** Real frame count — multi-frame formats (animated GIF) report
      * every frame, stills report 1, undecodable bytes 0. */
    def frameCount(bytes: Array[Byte]): Int = {
      val iis = try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)) catch { case _: Exception => null }
      if (iis == null) return 0
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) 0
        else {
          val r = readers.next()
          try { r.setInput(iis); r.getNumImages(true) } finally r.dispose()
        }
      } catch { case _: Exception => 0 } finally iis.close()
    }

    /** Real resize: draw scaled into a fresh RGB raster, re-encode as
      * PNG. Undecodable input yields empty bytes (skippable row). */
    def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] =
      read(bytes) match {
        case None => Array.empty
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, width, height, null) finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
      }

    /** Difference hash (dHash) — the standard perceptual image
      * fingerprint: scale to 9×8 grayscale (real pixels, real scaler),
      * emit one bit per horizontal neighbor pair (left brighter → 1),
      * 64 bits total. Encoding-invariant by construction (PNG/BMP of
      * the same pixels hash identically) and stable under resizing up
      * to a few bits of drift, which the banded near-dup search
      * tolerates ([[Dedup.imageNearDupPairs]]). Luma is the integer
      * (299R+587G+114B)/1000 — no float rounding anywhere, so a given
      * pixel raster always produces the same hash. Undecodable bytes →
      * None (skippable row, never a task failure). */
    def dHash(bytes: Array[Byte]): Option[Long] = read(bytes).map { img =>
      val out = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, 9, 8, null) finally g.dispose()
      val luma = Array.tabulate(8, 9) { (y, x) =>
        val p = out.getRGB(x, y)
        (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
      }
      var h = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (luma(y)(x) > luma(y)(x + 1)) h |= 1L << (y * 8 + x)
      h
    }
  }

  /** REAL PCM WAV decode via `javax.sound.sampled` (in the JDK).
    * Features (6 floats): channels, sample rate, bits/sample, frame
    * count, mean |amplitude| and RMS over 16-bit samples — exact
    * integer accumulation. The JDK has no resampler, so [[resize]]
    * refuses rather than faking a resample; compressed audio (mp3)
    * stays with [[StubDecoder]]. */
  object WavDecoder extends Decoder {
    private def stream(bytes: Array[Byte]) =
      try Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    def decode(bytes: Array[Byte]): Array[Float] = stream(bytes) match {
      case None => Array.empty
      case Some(s) => try {
        val f = s.getFormat
        val data = s.readAllBytes()
        var (sumAbs, sumSq, n) = (0L, 0L, 0L)
        if (f.getSampleSizeInBits == 16) {
          var i = 0
          while (i + 1 < data.length) {
            val v: Int =
              if (f.isBigEndian) (data(i) << 8) | (data(i + 1) & 0xff)
              else (data(i + 1) << 8) | (data(i) & 0xff)
            sumAbs += math.abs(v); sumSq += v.toLong * v; n += 1
            i += 2
          }
        }
        Array(f.getChannels.toFloat, f.getSampleRate,
          f.getSampleSizeInBits.toFloat, s.getFrameLength.toFloat,
          if (n == 0) 0f else (sumAbs.toDouble / n).toFloat,
          if (n == 0) 0f else math.sqrt(sumSq.toDouble / n).toFloat)
      } finally s.close()
    }

    def frameCount(bytes: Array[Byte]): Int = stream(bytes) match {
      case None => 0
      case Some(s) => try s.getFrameLength.toInt finally s.close()
    }

    def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] =
      throw new UnsupportedOperationException(
        "JDK javax.sound has no resampler — route audio resize to an external kernel")

    /** Energy-envelope fingerprint — dHash's idea applied to audio:
      * split the 16-bit PCM stream into `windows` equal windows, sum
      * |sample| per window (exact integer), emit one bit per adjacent
      * window pair (earlier louder → 1): windows−1 bits. Difference
      * coding makes the fingerprint AMPLITUDE-INVARIANT (a re-mastered
      * louder/quieter copy keeps every comparison, up to integer
      * truncation ties — the banded search's Hamming tolerance), and
      * it is exact-integer throughout, so a given PCM stream always
      * fingerprints identically. Non-PCM-16 or undecodable bytes →
      * None (skippable row). Feeds [[Dedup.audioNearDupPairs]]. */
    def energyFingerprint(bytes: Array[Byte], windows: Int = 64): Option[Long] = {
      require(windows >= 2 && windows <= 64, s"windows in [2,64]: $windows")
      stream(bytes) match {
        case None => None
        case Some(s) => try {
          val f = s.getFormat
          if (f.getSampleSizeInBits != 16) None
          else {
            val data = s.readAllBytes()
            val n = data.length / 2
            if (n < windows) None
            else {
              val e = new Array[Long](windows)
              var i = 0
              while (i < n) {
                val v: Int =
                  if (f.isBigEndian) (data(2 * i) << 8) | (data(2 * i + 1) & 0xff)
                  else (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
                e((i * windows) / n) += math.abs(v)
                i += 1
              }
              var h = 0L
              var w = 0
              while (w < windows - 1) {
                if (e(w) > e(w + 1)) h |= 1L << w
                w += 1
              }
              Some(h)
            }
          }
        } finally s.close()
      }
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

  case class DHashRow(id: Long, dhash: Option[Long])

  /** Partition-parallel dHash over a binary image column — same
    * mapPartitions shape as [[extractFeatures]]: kernel per partition,
    * rows stream through, no shuffle, no driver involvement. Feeds
    * [[Dedup.imageNearDupPairs]]. */
  def dHashes(spark: SparkSession, df: DataFrame, idCol: String,
              binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        DHashRow(id, ImageIoDecoder.dHash(bytes))
      })
      .toDF(idCol, "dhash")
  }

  /** Partition-parallel audio energy fingerprints — the audio twin of
    * [[dHashes]]. Feeds [[Dedup.audioNearDupPairs]]. */
  def audioFingerprints(spark: SparkSession, df: DataFrame, idCol: String,
                        binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        DHashRow(id, WavDecoder.energyFingerprint(bytes))
      })
      .toDF(idCol, "afp")
  }

  /** Deterministic synthetic image for tests and harness fixtures
    * (this container ships no real image corpus): an 8×8 grid of
    * grayscale cells whose bytes come from md5("img:gid:block"), drawn
    * at any resolution — the pattern depends only on RELATIVE pixel
    * position, so renders of one `gid` at different sizes or formats
    * depict the same image (the near-dup ground truth), while distinct
    * gids are uncorrelated noise. */
  def syntheticImage(gid: Long, width: Int, height: Int,
                     format: String = "png"): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cells = (0 until 4).flatMap { blk =>
      md.digest(s"img:$gid:$blk".getBytes("UTF-8")).toSeq
    }
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width) {
      val c = cells((y * 8 / height) * 8 + (x * 8 / width)) & 0xff
      img.setRGB(x, y, (c << 16) | (c << 8) | c)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic PCM WAV for tests and harness fixtures —
    * the audio twin of [[syntheticImage]]: a 440 Hz tone
    * amplitude-modulated by a 64-segment envelope whose levels come
    * from md5("wav:gid:block"), 1 s at 8 kHz mono 16-bit. The envelope
    * depends only on RELATIVE position, so re-renders of one `gid` at
    * different master volumes (`ampDiv`) or with ±1 LSB dither
    * (`dither`) are the same recording (near-dup ground truth) while
    * distinct gids are uncorrelated. StrictMath.sin keeps the samples
    * reproducible on any JVM. */
  def syntheticWav(gid: Long, ampDiv: Int = 1, dither: Boolean = false): Array[Byte] = {
    require(ampDiv >= 1, s"ampDiv >= 1: $ampDiv")
    val md = java.security.MessageDigest.getInstance("MD5")
    val env = (0 until 4).flatMap { blk =>
      md.digest(s"wav:$gid:$blk".getBytes("UTF-8")).toSeq
    }.map(b => (b & 0xff) + 1)
    val perSeg = 125
    val n = 64 * perSeg
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val amp = env(i / perSeg) * 100
      val base = StrictMath.sin(2 * StrictMath.PI * i * 440.0 / 8000.0) * amp
      val d = if (dither) (((i * 1103515245L + 12345L) >>> 16) & 1L).toInt * 2 - 1 else 0
      val v = (base.toInt / ampDiv + d).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
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
