package graft.multimodal

import graft.functions.PortableHash
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: opaque binary payload + typed metadata. At 100 TB
  * the payloads live in parquet binary columns (or object-store paths
  * for >row-group-size blobs) partitioned so a partition holds
  * ~targetPartitionBytes of payload, not a fixed row count. */
final case class MediaRow(
    media_id: Long, kind: String, content: Array[Byte],
    width: Int, height: Int, n_frames: Int, format: String)

final case class DecodedFrame(
    media_id: Long, frame_idx: Int, width: Int, height: Int, pixels: Array[Byte])

final case class MediaFeatures(
    media_id: Long, kind: String, n_frames: Int,
    mean_px: Double, std_px: Double, embedding: Array[Float])

/** Channel-0 integer summary of one PCM audio payload. */
final case class AudioStats(
    media_id: Long, n_samples: Long, sample_rate: Int, channels: Int,
    bits_per_sample: Int, sum_abs: Long, peak_abs: Long)

/**
 * Multimodal (image/video-as-binary) processing plumbing. REAL codec
 * coverage: still images + animated GIF via `javax.imageio`
 * ([[ImageIoCodec]]), and MJPEG-style video via real MP4/AVI container
 * demux ([[VideoContainers]]). [[FakeCodec]] remains only for
 * deterministic keystream tests and as the stand-in for inter-frame
 * codecs (H.264 etc.) that have no JVM decoder in this environment.
 * Everything Spark-side is real throughout: schemas, byte-balanced
 * partitioning, per-partition batch processing, frame explosion,
 * feature extraction — swapping a codec changes no plan shape.
 *
 * Execution shape: typed `mapPartitions` — the JVM analogue of
 * PySpark's `mapInPandas` (one batch of rows in, an iterator of
 * results out, no per-row UDF serialization boundary).
 */
object Multimodal {

  /**
   * STUB CODEC — deterministic fake in place of a real image codec.
   * Real boundary: `decode(bytes): frames of pixel arrays`. The fake
   * "format" is: payload bytes are the pixel stream (row-major,
   * 1 byte/px) for `n_frames` frames of `width`×`height`, generated
   * from an md5 keystream so tests are reproducible.
   */
  object FakeCodec {
    def encode(seed: String, width: Int, height: Int, nFrames: Int): Array[Byte] = {
      val n = width * height * nFrames
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val block = PortableHash.md5Hex(s"$seed:${i / 16}")
        out(i) = ((Character.digit(block.charAt(2 * (i % 16)), 16) << 4) |
          Character.digit(block.charAt(2 * (i % 16) + 1), 16)).toByte
        i += 1
      }
      out
    }

    /** The decode stub: splits the payload into per-frame pixel
      * arrays. A real codec would parse/decompress here. */
    def decode(content: Array[Byte], width: Int, height: Int, nFrames: Int): Seq[Array[Byte]] = {
      val frameLen = width * height
      (0 until nFrames).map(f =>
        java.util.Arrays.copyOfRange(content, f * frameLen, math.min((f + 1) * frameLen, content.length)))
    }
  }

  /**
   * REAL CODEC — JVM-native image decode via `javax.imageio` (PNG,
   * JPEG, BMP, GIF — whatever the running JVM registers). Pixels
   * normalize to 1-byte grayscale luma so the downstream resize/
   * feature path is codec-agnostic. Replaces the stub for
   * rows whose format starts with `image/`; [[FakeCodec]] stays for deterministic
   * keystream tests and as the video stand-in.
   */
  object ImageIoCodec {
    /** (width, height, row-major grayscale bytes) from an encoded
      * image payload. */
    def decodeImage(content: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      require(img != null, "payload is not a decodable image")
      toGray(img)
    }

    /** The shared luma normalization of both decode paths. */
    private def toGray(img: java.awt.image.BufferedImage): (Int, Int, Array[Byte]) = {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Byte](w * h)
      val raster = img.getRaster
      // raw-sample fast path ONLY for true grayscale: palette-indexed
      // images (GIF, PNG8) also have a 1-band raster but the samples
      // are palette indices, not luma — those must go through getRGB.
      val grayscale = raster.getNumBands == 1 &&
        !img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
      if (grayscale) {
        // raw samples (getRGB would push them through the gray→sRGB
        // gamma curve and corrupt the values); >8-bit samples (16-bit
        // gray PNG) scale down instead of truncating through toByte
        val bits = raster.getSampleModel.getSampleSize(0)
        val shift = math.max(0, bits - 8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = (raster.getSample(x, y, 0) >> shift).toByte
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            out(y * w + x) = luma.toByte
            x += 1
          }
          y += 1
        }
      }
      (w, h, out)
    }

    /** Encode grayscale pixels as PNG (test-side producer). */
    def encodePng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, width, height, pixels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Encode grayscale pixels as baseline JPEG (fixture-side producer
      * for the MJPEG path — the codec real MJPEG files actually
      * carry). Lossy: the consumer must compare through a tolerance,
      * not bit-exactly; at quality 0.95 the per-frame MEAN luma (the
      * DC term, lightly quantized) stays within ±2 of the source even
      * for white-noise pixels. */
    def encodeJpeg(width: Int, height: Int, pixels: Array[Byte],
        quality: Float = 0.95f): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, width, height, pixels)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(quality)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    /** All frames of a (possibly animated) image container — the REAL
      * multi-frame decode path: GIF animations carry N frames, PNG/JPEG
      * yield one. Each frame normalizes through the same grayscale
      * luma path as [[decodeImage]]. */
    def decodeAllFrames(content: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "payload is not a decodable image")
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val n = reader.getNumImages(true)
          (0 until n).map(i => toGray(reader.read(i)))
        } finally reader.dispose()
      } finally iis.close()
    }

    /** Animated-GIF encoder (test/fixture-side producer): grayscale
      * frames into one real GIF container via the JDK's sequence
      * writer. GIF's 256-color palette is lossless for 8-bit gray, so
      * encode→decode round-trips the pixel bytes exactly. */
    def encodeGif(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        // interlace OFF: the JDK GIF writer's interlaced output
        // round-trips scrambled (rows reordered, last row zeroed) at
        // small heights — observed empirically at h=4
        val param = writer.getDefaultWriteParam
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        frames.foreach { px =>
          val img = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setDataElements(0, 0, width, height, px)
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
  }

  /** Format-dispatched decode — the REAL paths:
    *  - `image/…`: `javax.imageio`, including MULTI-FRAME containers
    *    (an animated GIF yields one DecodedFrame per frame);
    *  - `video/mp4`: real ISO-BMFF demux ([[VideoContainers.Mp4Demux]]
    *    — moov/trak/stbl sample-table walk), each sample decoded via
    *    ImageIO (JPEG samples = MJPEG-in-MP4; PNG rides the same path);
    *  - `video/avi`: real RIFF demux ([[VideoContainers.AviDemux]] —
    *    movi-list chunk walk), samples decoded the same way.
    * Dims come from the payload, not the metadata. Other formats take
    * the stub keystream path (inter-frame codecs like H.264 stay out
    * of scope — no JVM decoder). All paths produce identical frame
    * shapes, so no plan or partitioning changes when a format flips
    * from stub to real. */
  def decodeFrames(m: MediaRow): Seq[DecodedFrame] =
    if (m.format.startsWith("image/")) {
      ImageIoCodec.decodeAllFrames(m.content).zipWithIndex.map {
        case ((w, h, px), idx) => DecodedFrame(m.media_id, idx, w, h, px)
      }
    } else if (m.format == "video/mp4" || m.format == "video/avi") {
      val samples =
        if (m.format == "video/mp4") VideoContainers.Mp4Demux.samples(m.content)
        else VideoContainers.AviDemux.samples(m.content)
      samples.zipWithIndex.map { case (sample, idx) =>
        val (w, h, px) = ImageIoCodec.decodeImage(sample)
        DecodedFrame(m.media_id, idx, w, h, px)
      }
    } else if (m.format == "video/y4m") {
      // uncompressed frame pipe: the luma planes ARE the pixels —
      // no codec layer at all, bit-exact by construction
      val (w, h, frames) = VideoContainers.Y4mDemux.frames(m.content)
      frames.zipWithIndex.map { case (px, idx) =>
        DecodedFrame(m.media_id, idx, w, h, px)
      }
    } else {
      FakeCodec.decode(m.content, m.width, m.height, m.n_frames)
        .zipWithIndex
        .map { case (px, idx) => DecodedFrame(m.media_id, idx, m.width, m.height, px) }
    }

  /** Byte-balanced repartitioning: media payloads are wildly variable;
    * a row-count partitioner puts 100 4K videos in one task and 100
    * icons in another. Range-partition on a payload-size rank so each
    * partition carries a comparable byte budget. */
  def balanceByBytes(df: DataFrame, targetPartitionBytes: Long): DataFrame = {
    val totalBytes = df.select(sum(length(col("content")).cast("long"))).first().getLong(0)
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetPartitionBytes).toInt)
    df.repartitionByRange(parts, col("content_size"), col("media_id"))
  }

  /** Per-payload PCM audio summary: REAL RIFF/WAVE parse
    * ([[VideoContainers.WavDemux]] — PCM needs no codec), channel-0
    * integer stats in one streaming pass. Same typed `mapPartitions`
    * shape as the frame paths, so audio rows ride the identical
    * partitioning/batching plumbing. */
  def wavStats(media: Dataset[MediaRow]): Dataset[AudioStats] =
    pcmAudioStats(media)

  /** [[wavStats]] generalized over the PCM containers: RIFF/WAVE
    * (little-endian samples) and IFF/AIFF (big-endian) rows ride the
    * same mapPartitions pass; other formats are skipped. */
  def pcmAudioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.collect {
        case m if m.format == "audio/wav" =>
          val w = VideoContainers.WavDemux.read(m.content)
          (m.media_id, w.nSamples, w.sampleRate, w.channels, w.bitsPerSample,
            (k: Int) => w.sample(k))
        case m if m.format == "audio/aiff" =>
          val a = VideoContainers.AiffDemux.read(m.content)
          (m.media_id, a.nSamples, a.sampleRate, a.channels, a.bitsPerSample,
            (k: Int) => a.sample(k))
      }.map { case (id, n, rate, ch, bits, sample) =>
        var k = 0; var sumAbs = 0L; var peak = 0L
        while (k < n) {
          val a = math.abs(sample(k).toLong)
          sumAbs += a; if (a > peak) peak = a
          k += 1
        }
        AudioStats(id, n.toLong, rate, ch, bits, sumAbs, peak)
      }
    }
  }

  /** Frame sampling + decode: every `everyN`-th frame, exploded to
    * (media_id, frame_idx, pixels) rows. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => decodeFrames(m).filter(_.frame_idx % everyN == 0))
    }
  }

  /** Nearest-neighbour resize on a decoded frame (real array math —
    * works the same on stub or real pixels). */
  def resizeFrame(f: DecodedFrame, newW: Int, newH: Int): DecodedFrame = {
    val out = new Array[Byte](newW * newH)
    var y = 0
    while (y < newH) {
      val sy = y * f.height / newH
      var x = 0
      while (x < newW) {
        out(y * newW + x) = f.pixels(sy * f.width + (x * f.width / newW))
        x += 1
      }
      y += 1
    }
    DecodedFrame(f.media_id, f.frame_idx, newW, newH, out)
  }

  def resized(frames: Dataset[DecodedFrame], newW: Int, newH: Int): Dataset[DecodedFrame] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions(_.map(resizeFrame(_, newW, newH)))
  }

  /** Per-media feature extraction: decode all frames in one batch
    * pass, emit summary stats + a 16-dim byte-histogram embedding. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val frames = decodeFrames(m).map(_.pixels)
        var n = 0L; var s = 0.0; var s2 = 0.0
        val hist = new Array[Long](16)
        frames.foreach(_.foreach { b =>
          val v = b & 0xff
          n += 1; s += v; s2 += v.toDouble * v
          hist(v >> 4) += 1
        })
        val mean = if (n > 0) s / n else 0.0
        val std = if (n > 0) math.sqrt(math.max(0, s2 / n - mean * mean)) else 0.0
        val emb = hist.map(h => if (n > 0) (h.toDouble / n).toFloat else 0f)
        MediaFeatures(m.media_id, m.kind, m.n_frames, mean, std, emb)
      }
    }
  }

  /** Deterministic synthetic media table (the stub's data source —
    * real pipelines land binary from object storage). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { i =>
      val (w, h, f) = if (i % 3 == 0) (16, 12, 4) else (8, 8, 1)
      val kind = if (i % 3 == 0) "video" else "image"
      MediaRow(i, kind, FakeCodec.encode(s"media:$i", w, h, f), w, h, f, "fake/v1")
    }
  }
}
