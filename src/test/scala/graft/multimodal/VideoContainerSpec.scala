package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Real MP4 (ISO BMFF) and AVI (RIFF) container demux: mux→demux
  * round-trips, chunk-table walking, 64-bit offsets, MJPEG samples,
  * malformed-input rejection, and the full Spark decode path. */
class VideoContainerSpec extends AnyFunSuite {
  import VideoContainers._

  private def grayFrames(seed: String, w: Int, h: Int, n: Int): Seq[Array[Byte]] =
    (0 until n).map(f => Multimodal.FakeCodec.encode(s"$seed:$f", w, h, 1))

  private def pngSamples(seed: String, w: Int, h: Int, n: Int): Seq[Array[Byte]] =
    grayFrames(seed, w, h, n).map(Multimodal.ImageIoCodec.encodePng(w, h, _))

  // ---- MP4 ---------------------------------------------------------

  test("mp4 mux→demux returns every sample byte-exact, in order") {
    // 5 samples → 3 chunks at 2-per-chunk: exercises the stsc run
    // table including the short last chunk
    val samples = pngSamples("mp4rt", 7, 5, 5)
    val mp4 = Mp4Mux.write(samples, 7, 5, compressor = "png ")
    val back = Mp4Demux.samples(mp4)
    assert(back.length === 5)
    samples.zip(back).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("mp4 co64 (64-bit chunk offsets) demux path") {
    val samples = pngSamples("mp4co64", 6, 4, 4)
    val mp4 = Mp4Mux.write(samples, 6, 4, compressor = "png ", useCo64 = true)
    val back = Mp4Demux.samples(mp4)
    assert(back.map(_.toSeq) === samples.map(_.toSeq))
  }

  test("mp4 with JPEG samples is a decodable MJPEG: frames decode with right dims") {
    val w = 16; val h = 12
    val jpegs = grayFrames("mjpg", w, h, 3).map { px =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, px)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mp4 = Mp4Mux.write(jpegs, w, h)
    val m = MediaRow(1L, "video", mp4, 0, 0, 3, "video/mp4")
    val frames = Multimodal.decodeFrames(m)
    assert(frames.length === 3)
    assert(frames.forall(f => f.width == w && f.height == h))
    // JPEG is lossy but close: mean abs error vs source under 8/255
    val src = grayFrames("mjpg", w, h, 3)
    frames.zip(src).foreach { case (f, s) =>
      val mae = f.pixels.zip(s).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum
        .toDouble / s.length
      assert(mae < 8.0, s"frame ${f.frame_idx} mean abs error $mae")
    }
  }

  test("avi MJPEG (encodeJpeg frames) decodes with exact dims and mean luma within ±2") {
    val w = 24; val h = 16 // whole DCT blocks — no partial-block edge effects
    val src = grayFrames("mjpg-avi", w, h, 3)
    val jpegs = src.map(Multimodal.ImageIoCodec.encodeJpeg(w, h, _))
    val avi = AviMux.write(jpegs, w, h, fourccCodec = "MJPG")
    val frames = Multimodal.decodeFrames(MediaRow(1L, "video", avi, 0, 0, 3, "video/avi"))
    assert(frames.length === 3)
    assert(frames.forall(f => f.width == w && f.height == h))
    frames.zip(src).foreach { case (f, s) =>
      val mean = f.pixels.map(_ & 0xff).sum.toDouble / s.length
      val expected = s.map(_ & 0xff).sum.toDouble / s.length
      assert(math.abs(mean - expected) <= 2.0,
        s"frame ${f.frame_idx} mean $mean vs source $expected")
    }
  }

  test("mp4 rejects payloads without moov / with truncated boxes") {
    assertThrows[IllegalArgumentException](Mp4Demux.samples("nonsense-bytes!!".getBytes))
    val good = Mp4Mux.write(pngSamples("trunc", 5, 4, 2), 5, 4, compressor = "png ")
    // cut inside moov: the box walk must detect the overrun
    assertThrows[IllegalArgumentException](
      Mp4Demux.samples(java.util.Arrays.copyOfRange(good, 0, good.length - 10)))
  }

  // ---- AVI ---------------------------------------------------------

  test("avi mux→demux returns every frame chunk byte-exact, incl. odd-size padding") {
    val samples = pngSamples("avirt", 7, 5, 4)
    val avi = AviMux.write(samples, 7, 5, fourccCodec = "PNG ")
    val back = AviDemux.samples(avi)
    assert(back.map(_.toSeq) === samples.map(_.toSeq))
    // odd-size chunks force the WORD-alignment pad byte on every
    // boundary — a naive parser desyncs after the first frame
    val odd = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6, 7, 8, 9))
    assert(odd.exists(_.length % 2 == 1))
    val oddBack = AviDemux.samples(AviMux.write(odd, 2, 2))
    assert(oddBack.map(_.toSeq) === odd.map(_.toSeq))
  }

  test("avi rejects bad signatures") {
    assertThrows[IllegalArgumentException](AviDemux.samples("RIFFxxxxWAVE".getBytes))
    assertThrows[IllegalArgumentException](AviDemux.samples(Array.fill[Byte](6)(1)))
  }

  test("riff walkers fail loudly on a >=2^31 chunk size instead of hanging") {
    // size 0xFFFFFFF8 reads as -8 through .toInt: the loop advance
    // 8 + size + (size & 1) would be zero, an infinite loop, and the
    // overrun require passes for negative sizes. Must throw instead.
    def le(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val huge = le(0xFFFFFFF8L)
    // outer AVI walk
    val avi = "RIFF".getBytes ++ le(12) ++ "AVI ".getBytes ++ "JUNK".getBytes ++ huge
    assertThrows[IllegalArgumentException](AviDemux.samples(avi))
    // inner movi walk: patch the first frame chunk's size in a valid AVI
    val good = AviMux.write(Seq(Array[Byte](1, 2, 3, 4)), 2, 2)
    val dc = good.indices.find(i => i + 8 <= good.length &&
      new String(good, i, 4, "ISO-8859-1") == "00dc").get
    val bad = good.clone(); huge.copyToArray(bad, dc + 4)
    assertThrows[IllegalArgumentException](AviDemux.samples(bad))
    // WAV walk
    val wav = "RIFF".getBytes ++ le(12) ++ "WAVE".getBytes ++ "JUNK".getBytes ++ huge
    assertThrows[IllegalArgumentException](WavDemux.read(wav))
  }

  // ---- full Spark path ---------------------------------------------

  test("video/mp4 and video/avi rows decode through the production sampleFrames path") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val w = 6; val h = 4
    val media = spark.createDataset(Seq(
      MediaRow(10L, "video",
        Mp4Mux.write(pngSamples("sp:mp4", w, h, 4), w, h, compressor = "png "),
        0, 0, 4, "video/mp4"),
      MediaRow(11L, "video",
        AviMux.write(pngSamples("sp:avi", w, h, 3), w, h, fourccCodec = "PNG "),
        0, 0, 3, "video/avi")))
    val frames = Multimodal.sampleFrames(media, everyN = 1).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(frames(10L).length === 4 && frames(11L).length === 3)
    // pixels must be the exact keystream (PNG lossless end-to-end)
    frames(10L).zip(grayFrames("sp:mp4", w, h, 4)).foreach { case (f, px) =>
      assert(f.pixels.toSeq === px.toSeq) }
    frames(11L).zip(grayFrames("sp:avi", w, h, 3)).foreach { case (f, px) =>
      assert(f.pixels.toSeq === px.toSeq) }
    // and the stride applies to container frames uniformly
    val strided = Multimodal.sampleFrames(media, everyN = 2).collect()
    assert(strided.count(_.media_id == 10L) === 2)
    assert(strided.count(_.media_id == 11L) === 2)
  }

  // ---- WAV ---------------------------------------------------------

  test("wav mux→demux round-trips fmt fields and PCM bytes; signed 16-bit LE samples") {
    val pcm = Multimodal.FakeCodec.encode("wavrt", 200, 1, 1) // 100 16-bit samples
    val wav = WavMux.write(pcm, sampleRate = 44100, channels = 1, bitsPerSample = 16)
    val w = WavDemux.read(wav)
    assert((w.sampleRate, w.channels, w.bitsPerSample) === ((44100, 1, 16)))
    assert(w.nSamples === 100)
    assert(w.data.toSeq === pcm.toSeq)
    // sign + byte order: sample 0 = LE(b0,b1) as signed
    val u = (pcm(0) & 0xff) | ((pcm(1) & 0xff) << 8)
    assert(w.sample(0) === (if (u >= 0x8000) u - 0x10000 else u))
  }

  test("wav 8-bit odd-length data gets the pad byte; unknown chunks are skipped") {
    val pcm = Array.tabulate[Byte](33)(i => (i * 7).toByte) // odd → pad path
    val wav = WavMux.write(pcm, sampleRate = 8000, channels = 1, bitsPerSample = 8)
    assert(wav.length % 2 === 0, "odd data chunk must be WORD-padded")
    val w = WavDemux.read(wav)
    assert(w.nSamples === 33)
    assert(w.sample(0) === (pcm(0) & 0xff) - 128) // 8-bit is unsigned-biased
    // splice an unknown 'fact' chunk between fmt and data: still parses
    val factless = wav
    val head = factless.take(12)
    val rest = factless.drop(12)
    val fact = "fact".getBytes ++ Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4)
    val spliced = head ++ fact ++ rest
    // fix RIFF size field (+12)
    val size = ((spliced.length - 8) & 0xffffffffL)
    spliced(4) = (size & 0xff).toByte; spliced(5) = ((size >> 8) & 0xff).toByte
    spliced(6) = ((size >> 16) & 0xff).toByte; spliced(7) = ((size >> 24) & 0xff).toByte
    val w2 = WavDemux.read(spliced)
    assert(w2.nSamples === 33 && w2.data.toSeq === pcm.toSeq)
  }

  test("y4m mux→demux round-trips luma bit-exact for mono and 420 (odd dims)") {
    val w = 5; val h = 3 // odd dims: 420 chroma planes are ceil-half
    val frames = grayFrames("y4m", w, h, 4)
    Seq("mono", "420").foreach { cs =>
      val y4m = Y4mMux.write(frames, w, h, colorspace = cs)
      val (dw, dh, got) = Y4mDemux.frames(y4m)
      assert((dw, dh) === (w, h))
      assert(got.length === 4)
      got.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq, cs) }
    }
  }

  test("y4m demux rejects bad magic, truncated frames, unknown colorspace") {
    val ok = Y4mMux.write(grayFrames("y", 4, 4, 1), 4, 4)
    intercept[IllegalArgumentException](Y4mDemux.frames("JUNK\n".getBytes))
    intercept[IllegalArgumentException](Y4mDemux.frames(ok.dropRight(3)))
    val badCs = new String(ok.takeWhile(_ != '\n'.toByte)).replace("Cmono", "Cxyz")
    intercept[RuntimeException](
      Y4mDemux.frames((badCs + "\n").getBytes ++ ok.drop(ok.indexOf('\n'.toByte) + 1)))
  }

  test("aiff: extended-80 sample rate round-trips; samples are signed BIG-endian") {
    Seq(8000, 8100, 11025, 22050, 44100, 48000, 96000, 1).foreach { r =>
      assert(VideoContainers.readExtended80(VideoContainers.extended80(r), 0) === r)
    }
    // two samples: 0x0102 -> 258; 0xFF7F -> -129 when read BE
    val data = Array[Byte](0x01, 0x02, 0xff.toByte, 0x7f)
    val aiff = AiffMux.write(data, sampleRate = 22050, channels = 1, bitsPerSample = 16)
    val got = AiffDemux.read(aiff)
    assert((got.sampleRate, got.channels, got.bitsPerSample, got.nSamples) === ((22050, 1, 16, 2)))
    assert(got.sample(0) === 258)
    assert(got.sample(1) === -129)
    // the SAME bytes through WAV read little-endian — proves the two
    // parsers really differ where the formats differ
    val wav = WavMux.write(data, sampleRate = 22050, channels = 1, bitsPerSample = 16)
    val wgot = WavDemux.read(wav)
    assert(wgot.sample(0) === 0x0201)
    assert(AiffDemux.read(aiff).sample(0) !== wgot.sample(0))
  }

  test("srt: write→parse round-trips cues; tolerates CRLF; rejects malformed blocks") {
    val cues = Seq(
      (1, 0L, 1500L, "hello"),
      (2, 3661001L, 3662999L, "two\nlines"), // >1h start exercises HH field
      (3, 59999L, 60000L, "third"))
    val srt = Subtitles.writeSrt(cues)
    assert(Subtitles.parseSrt(srt) === cues)
    // CRLF variant parses identically
    val crlf = new String(srt, java.nio.charset.StandardCharsets.UTF_8)
      .replace("\n", "\r\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(Subtitles.parseSrt(crlf) === cues)
    intercept[RuntimeException](Subtitles.parseSrt("1\nnot a time line\ntext\n".getBytes))
    intercept[RuntimeException](Subtitles.parseSrt("1\n00:00:00,000 --> 00:00:01,000\n".getBytes))
  }

  test("wav demux rejects non-PCM and non-WAVE payloads") {
    val pcm = Array.tabulate[Byte](8)(_.toByte)
    val wav = WavMux.write(pcm, 8000, 1, 16)
    // flip audioFormat (fmt payload byte 0, at offset 20) to 2 (ADPCM)
    val bad = wav.clone(); bad(20) = 2
    assertThrows[IllegalArgumentException](WavDemux.read(bad))
    assertThrows[IllegalArgumentException](
      WavDemux.read("RIFFxxxxJUNK".getBytes ++ Array.fill[Byte](16)(0)))
  }
}
