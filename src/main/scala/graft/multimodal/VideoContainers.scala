package graft.multimodal

import java.io.ByteArrayOutputStream

/**
 * REAL video-container parsing: an ISO base-media (MP4) demuxer and a
 * RIFF/AVI demuxer, plus the matching fixture-side muxers. This closes
 * the gap between the "video" claim and the code — the container walk
 * (box/chunk structure, sample tables, chunk offsets) is genuine
 * format parsing per the public specs (ISO/IEC 14496-12 box grammar;
 * the RIFF/AVI chunk grammar), not a stand-in.
 *
 * Codec layer: each demuxed SAMPLE is a complete encoded picture that
 * is handed to [[Multimodal.ImageIoCodec]] — JPEG samples make this
 * classic MJPEG-in-MP4 / MJPEG-in-AVI; PNG samples ride the same path
 * and round-trip losslessly, which is what the keystream oracles use.
 * Inter-frame-compressed codecs (H.264 etc.) remain out of scope: a
 * sample there is not independently decodable and the JVM has no
 * decoder for them (documented limitation, as before).
 *
 * Scale shape: both demuxers are per-row byte parsing inside the
 * existing `mapPartitions` decode path — map-only, no shuffle, and the
 * byte-balanced partitioner ([[Multimodal.balanceByBytes]]) already
 * bounds per-task payload bytes, so a 100 TB media table demuxes with
 * the same plan as the single-image path.
 *
 * Reference scope: the reference pipelines treat media as opaque
 * blobs; container demux is a beyond-reference capability of the
 * training-data-pipeline family (multimodal columns).
 */
object VideoContainers {

  // ---- big-endian readers (ISO BMFF) -------------------------------

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long = (be32(b, off) << 32) | be32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** One parsed box: type + absolute payload bounds. */
  private final case class Box(typ: String, payloadStart: Int, payloadEnd: Int)

  /** Walk the sibling boxes in [start, end): ISO 14496-12 §4.2 box
    * grammar — 32-bit size (1 → 64-bit largesize follows the type,
    * 0 → box extends to the end of the enclosing scope). */
  private def boxes(b: Array[Byte], start: Int, end: Int): Seq[Box] = {
    val out = Seq.newBuilder[Box]
    var off = start
    while (off + 8 <= end) {
      val size32 = be32(b, off)
      val typ = fourcc(b, off + 4)
      val (payloadStart, boxEnd) =
        if (size32 == 1) {
          require(off + 16 <= end, s"truncated largesize box '$typ' at $off")
          (off + 16, off + be64(b, off + 8))
        } else if (size32 == 0) (off + 8, end.toLong)
        else (off + 8, off + size32)
      require(boxEnd <= end && boxEnd >= payloadStart,
        s"box '$typ' at $off overruns enclosing scope ($boxEnd > $end)")
      out += Box(typ, payloadStart, boxEnd.toInt)
      off = boxEnd.toInt
    }
    out.result()
  }

  private def child(b: Array[Byte], parent: Box, typ: String): Option[Box] =
    boxes(b, parent.payloadStart, parent.payloadEnd).find(_.typ == typ)

  /**
   * ISO BMFF demuxer: returns the encoded sample payloads of the first
   * video (`hdlr` = 'vide') track, in sample order, reconstructed from
   * the sample tables — `stsc` (sample→chunk runs), `stsz` (sample
   * sizes), `stco`/`co64` (absolute chunk offsets). This is the real
   * demux algorithm: per chunk, samples are laid out back-to-back from
   * the chunk's file offset.
   */
  object Mp4Demux {
    def samples(bytes: Array[Byte]): Seq[Array[Byte]] = {
      val top = boxes(bytes, 0, bytes.length)
      val moov = top.find(_.typ == "moov")
        .getOrElse(throw new IllegalArgumentException("not an MP4: no moov box"))
      val stbl = boxes(bytes, moov.payloadStart, moov.payloadEnd)
        .filter(_.typ == "trak")
        .flatMap { trak =>
          for {
            mdia <- child(bytes, trak, "mdia")
            hdlr <- child(bytes, mdia, "hdlr")
            // FullBox header (4) + pre_defined (4), then handler_type
            if fourcc(bytes, hdlr.payloadStart + 8) == "vide"
            minf <- child(bytes, mdia, "minf")
            stbl <- child(bytes, minf, "stbl")
          } yield stbl
        }.headOption
        .getOrElse(throw new IllegalArgumentException("no video track sample table"))

      // stsz: FullBox(4) + sample_size(4) + sample_count(4) [+ table]
      val stsz = child(bytes, stbl, "stsz")
        .getOrElse(throw new IllegalArgumentException("missing stsz"))
      val uniformSize = be32(bytes, stsz.payloadStart + 4)
      val nSamples = be32(bytes, stsz.payloadStart + 8).toInt
      val sizes: Int => Long =
        if (uniformSize != 0) _ => uniformSize
        else i => be32(bytes, stsz.payloadStart + 12 + 4 * i)

      // stco (32-bit) or co64 (64-bit): FullBox(4) + entry_count(4) + offsets
      val (chunkOffsets, nChunks) = child(bytes, stbl, "stco") match {
        case Some(stco) =>
          val n = be32(bytes, stco.payloadStart + 4).toInt
          ((i: Int) => be32(bytes, stco.payloadStart + 8 + 4 * i), n)
        case None =>
          val co64 = child(bytes, stbl, "co64")
            .getOrElse(throw new IllegalArgumentException("missing stco/co64"))
          val n = be32(bytes, co64.payloadStart + 4).toInt
          ((i: Int) => be64(bytes, co64.payloadStart + 8 + 8 * i), n)
      }

      // stsc: FullBox(4) + entry_count(4) + (first_chunk,
      // samples_per_chunk, sample_description_index) runs; a run covers
      // every chunk until the next run's first_chunk.
      val stsc = child(bytes, stbl, "stsc")
        .getOrElse(throw new IllegalArgumentException("missing stsc"))
      val nRuns = be32(bytes, stsc.payloadStart + 4).toInt
      val runs = (0 until nRuns).map { i =>
        val base = stsc.payloadStart + 8 + 12 * i
        (be32(bytes, base).toInt, be32(bytes, base + 4).toInt)
      }

      val out = Seq.newBuilder[Array[Byte]]
      var sample = 0
      var run = 0
      var chunk = 1 // 1-based per spec
      while (sample < nSamples && chunk <= nChunks) {
        while (run + 1 < runs.length && runs(run + 1)._1 <= chunk) run += 1
        val perChunk = runs(run)._2
        var off = chunkOffsets(chunk - 1)
        var i = 0
        while (i < perChunk && sample < nSamples) {
          val len = sizes(sample)
          require(off + len <= bytes.length, s"sample $sample overruns mdat")
          out += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
          off += len
          sample += 1
          i += 1
        }
        chunk += 1
      }
      require(sample == nSamples, s"chunk tables cover $sample of $nSamples samples")
      out.result()
    }
  }

  /**
   * Fixture-side MP4 muxer: a minimal but structurally complete ISO
   * BMFF file — `ftyp` + `mdat` + `moov` with one video track and full
   * sample tables. Samples are deliberately packed TWO per chunk so
   * the demuxer's stsc/stco chunk walk is genuinely exercised (a
   * one-chunk file would never touch the run logic).
   */
  object Mp4Mux {
    private def beInt(out: ByteArrayOutputStream, v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }

    private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(payload.length + 8)
      beInt(out, payload.length + 8L)
      out.write(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.write(payload)
      out.toByteArray
    }

    private def concat(parts: Array[Byte]*): Array[Byte] = {
      val out = new ByteArrayOutputStream(parts.map(_.length).sum)
      parts.foreach(out.write)
      out.toByteArray
    }

    private def fullBox(typ: String, version: Int, flags: Int, payload: Array[Byte]): Array[Byte] =
      box(typ, concat(Array[Byte](version.toByte,
        ((flags >> 16) & 0xff).toByte, ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte), payload))

    private def bytesOf(vs: Long*): Array[Byte] = {
      val out = new ByteArrayOutputStream(vs.length * 4)
      vs.foreach(beInt(out, _))
      out.toByteArray
    }

    val SamplesPerChunk = 2

    /** Mux encoded picture samples (JPEG → MJPEG-in-MP4; PNG for the
      * lossless fixtures) into one video-track MP4. `useCo64` switches
      * the chunk-offset table to the 64-bit form (the >4 GB layout) so
      * both demux branches are testable. */
    def write(samplesIn: Seq[Array[Byte]], width: Int, height: Int,
              compressor: String = "jpeg", useCo64: Boolean = false): Array[Byte] = {
      require(samplesIn.nonEmpty, "need at least one sample")
      val ftyp = box("ftyp", concat("isom".getBytes, bytesOf(0x200L), "isommp41".getBytes))
      val mdatPayload = concat(samplesIn: _*)
      val mdat = box("mdat", mdatPayload)
      val mdatDataStart = ftyp.length + 8L

      // chunk layout: SamplesPerChunk samples back-to-back per chunk
      val chunkFirstSample = samplesIn.indices.filter(_ % SamplesPerChunk == 0)
      val sampleOffsets = samplesIn.scanLeft(mdatDataStart)(_ + _.length)
      val chunkOffs = chunkFirstSample.map(sampleOffsets(_))

      val timescale = 30000L
      val sampleDelta = 1001L
      val duration = sampleDelta * samplesIn.length

      val stsd = fullBox("stsd", 0, 0, concat(bytesOf(1L), visualSampleEntry(compressor, width, height)))
      val stts = fullBox("stts", 0, 0, bytesOf(1L, samplesIn.length.toLong, sampleDelta))
      val stscRuns =
        if (samplesIn.length % SamplesPerChunk == 0) Seq((1L, SamplesPerChunk.toLong))
        else Seq((1L, SamplesPerChunk.toLong),
          (chunkFirstSample.length.toLong, (samplesIn.length % SamplesPerChunk).toLong))
      val stsc = fullBox("stsc", 0, 0,
        concat(bytesOf(stscRuns.length.toLong),
          concat(stscRuns.map { case (first, per) => bytesOf(first, per, 1L) }: _*)))
      val stsz = fullBox("stsz", 0, 0,
        concat(bytesOf(0L, samplesIn.length.toLong), bytesOf(samplesIn.map(_.length.toLong): _*)))
      val stcoBox =
        if (useCo64) fullBox("co64", 0, 0, concat(bytesOf(chunkOffs.length.toLong),
          concat(chunkOffs.map { o =>
            val out = new ByteArrayOutputStream(8); beInt(out, o >> 32); beInt(out, o & 0xffffffffL)
            out.toByteArray
          }: _*)))
        else fullBox("stco", 0, 0, bytesOf((chunkOffs.length.toLong +: chunkOffs): _*))
      val stbl = box("stbl", concat(stsd, stts, stsc, stsz, stcoBox))

      val url = fullBox("url ", 0, 1, Array.emptyByteArray) // self-contained
      val dref = fullBox("dref", 0, 0, concat(bytesOf(1L), url))
      val dinf = box("dinf", dref)
      val vmhd = fullBox("vmhd", 0, 1, bytesOf(0L, 0L))
      val minf = box("minf", concat(vmhd, dinf, stbl))
      val hdlr = fullBox("hdlr", 0, 0,
        concat(bytesOf(0L), "vide".getBytes, bytesOf(0L, 0L, 0L), Array[Byte](0)))
      val mdhd = fullBox("mdhd", 0, 0,
        concat(bytesOf(0L, 0L, timescale, duration), Array[Byte](0x55, ('n' - 0x60 << 5 | 'd' - 0x60).toByte, 0, 0)))
      val mdia = box("mdia", concat(mdhd, hdlr, minf))
      val tkhd = fullBox("tkhd", 0, 7, // enabled | in-movie | in-preview
        concat(bytesOf(0L, 0L, 1L, 0L, duration, 0L, 0L, 0L, 0L), // …layer/alt, volume/reserved
          bytesOf(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L), // identity matrix
          bytesOf(width.toLong << 16, height.toLong << 16)))
      val trak = box("trak", concat(tkhd, mdia))
      val mvhd = fullBox("mvhd", 0, 0,
        concat(bytesOf(0L, 0L, timescale, duration, 0x10000L), Array[Byte](1, 0, 0, 0),
          bytesOf(0, 0, 0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L),
          bytesOf(0, 0, 0, 0, 0, 0, 2L))) // next_track_ID
      val moov = box("moov", concat(mvhd, trak))
      concat(ftyp, mdat, moov)
    }

    /** VisualSampleEntry (ISO 14496-12 §12.1.3): the stsd child that
      * names the sample codec. 'jpeg' = MJPEG samples; any fourcc
      * works for the demux side, which dispatches on payload bytes. */
    private def visualSampleEntry(compressor: String, width: Int, height: Int): Array[Byte] = {
      require(compressor.length == 4, "compressor must be a fourcc")
      val out = new ByteArrayOutputStream(86)
      beInt(out, 86L)
      out.write(compressor.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.write(new Array[Byte](6)) // reserved
      out.write(0); out.write(1) // data_reference_index = 1
      out.write(new Array[Byte](16)) // pre_defined + reserved
      out.write((width >> 8) & 0xff); out.write(width & 0xff)
      out.write((height >> 8) & 0xff); out.write(height & 0xff)
      beInt(out, 0x00480000L); beInt(out, 0x00480000L) // 72 dpi
      beInt(out, 0L)
      out.write(0); out.write(1) // frame_count = 1
      out.write(new Array[Byte](32)) // compressorname (pascal string, empty)
      out.write(0); out.write(24) // depth
      out.write(0xff); out.write(0xff) // pre_defined = -1
      out.toByteArray
    }
  }

  // ---- RIFF/AVI (little-endian) ------------------------------------

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /**
   * RIFF/AVI demuxer: validates the RIFF/'AVI ' signature, finds the
   * 'movi' LIST, and collects the video stream chunks ('##dc'
   * compressed / '##db' uncompressed) in file order — the real AVI
   * frame walk, including the WORD-alignment pad byte after odd-sized
   * chunks that trips naive parsers.
   */
  object AviDemux {
    def samples(bytes: Array[Byte]): Seq[Array[Byte]] = {
      require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ",
        "not an AVI: bad RIFF signature")
      val riffEnd = math.min(bytes.length.toLong, 8 + le32(bytes, 4)).toInt
      val out = Seq.newBuilder[Array[Byte]]
      var off = 12
      var moviFound = false
      while (off + 8 <= riffEnd) {
        val id = fourcc(bytes, off)
        val size = le32(bytes, off + 4).toInt
        // A 32-bit size >= 2^31 goes negative through .toInt and would
        // make the loop advance zero or backwards — fail loudly like the
        // MP4 path instead of hanging the executor task on corrupt media.
        require(size >= 0, s"chunk '$id' at $off has invalid size $size")
        if (id == "LIST" && off + 12 <= riffEnd && fourcc(bytes, off + 8) == "movi") {
          moviFound = true
          var c = off + 12
          val end = math.min(off + 8 + size, riffEnd)
          while (c + 8 <= end) {
            val cid = fourcc(bytes, c)
            val csize = le32(bytes, c + 4).toInt
            require(csize >= 0, s"chunk '$cid' at $c has invalid size $csize")
            require(c + 8 + csize <= end, s"chunk '$cid' overruns movi list")
            if (cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
              (cid.substring(2) == "dc" || cid.substring(2) == "db"))
              out += java.util.Arrays.copyOfRange(bytes, c + 8, c + 8 + csize)
            c += 8 + csize + (csize & 1) // pad to WORD boundary
          }
        }
        off += 8 + size + (size & 1)
      }
      require(moviFound, "not an AVI: no movi list")
      out.result()
    }
  }

  /**
   * Fixture-side AVI muxer: RIFF('AVI ') with a complete hdrl
   * (avih + one strl with strh/strf), the movi list, and an idx1
   * index — the standard layout per the public AVI RIFF spec. Odd
   * sample sizes get the mandatory pad byte, so lossless PNG samples
   * (whose sizes are rarely even) exercise the alignment path.
   */
  object AviMux {
    private def leInt(out: ByteArrayOutputStream, v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }

    private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(payload.length + 9)
      out.write(id.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      leInt(out, payload.length.toLong)
      out.write(payload)
      if ((payload.length & 1) == 1) out.write(0) // WORD-align
      out.toByteArray
    }

    private def list(typ: String, children: Array[Byte]*): Array[Byte] = {
      val inner = new ByteArrayOutputStream()
      inner.write(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      children.foreach(inner.write)
      chunk("LIST", inner.toByteArray)
    }

    private def leBytes(vs: Long*): Array[Byte] = {
      val out = new ByteArrayOutputStream(vs.length * 4)
      vs.foreach(leInt(out, _))
      out.toByteArray
    }

    def write(frames: Seq[Array[Byte]], width: Int, height: Int,
              fourccCodec: String = "MJPG", fps: Int = 30): Array[Byte] = {
      require(frames.nonEmpty, "need at least one frame")
      val maxBytes = frames.map(_.length).max.toLong
      val avih = chunk("avih", leBytes(
        1000000L / fps, maxBytes * fps, 0, 0x10, // usec/frame, byte rate, pad, HASINDEX
        frames.length.toLong, 0, 1, maxBytes, width.toLong, height.toLong, 0, 0, 0, 0))
      val strh = chunk("strh", Array.concat( // AVISTREAMHEADER, 56 bytes
        "vids".getBytes, fourccCodec.getBytes,
        leBytes(0, 0, 0, 1, fps.toLong, 0, frames.length.toLong, maxBytes,
          -1L & 0xffffffffL, 0, 0, 0))) // …quality, sampleSize, rcFrame
      val strf = chunk("strf", leBytes( // BITMAPINFOHEADER
        40, width.toLong, height.toLong, 1L | (24L << 16), // planes=1, bitcount=24
        le32(fourccCodec.getBytes.padTo(4, ' '.toByte), 0), // biCompression fourcc
        width.toLong * height * 3, 0, 0, 0, 0))
      val movi = list("movi", frames.map(chunk("00dc", _)): _*)
      // idx1 offsets are relative to the 'movi' fourcc position
      val offsets = frames.scanLeft(4L) { case (off, f) => off + 8 + f.length + (f.length & 1) }
      val idx1 = chunk("idx1", Array.concat(frames.zipWithIndex.map { case (f, i) =>
        Array.concat("00dc".getBytes, leBytes(0x10, offsets(i), f.length.toLong))
      }: _*))
      val body = Array.concat("AVI ".getBytes,
        list("hdrl", avih, list("strl", strh, strf)), movi, idx1)
      val out = new ByteArrayOutputStream(body.length + 8)
      out.write("RIFF".getBytes)
      leInt(out, body.length.toLong)
      out.write(body)
      out.toByteArray
    }
  }

  /** One parsed PCM WAV: format fields from 'fmt ', raw bytes from
    * 'data' (little-endian samples, interleaved channels). */
  final case class WavPcm(
      sampleRate: Int, channels: Int, bitsPerSample: Int, data: Array[Byte]) {
    def nSamples: Int = data.length / ((bitsPerSample / 8) * channels)
    /** Sample `k` of channel `ch` as a signed Int (8-bit WAV is
      * unsigned-biased per the spec; 16-bit is signed LE). */
    def sample(k: Int, ch: Int = 0): Int = {
      val bytesPer = bitsPerSample / 8
      val off = (k * channels + ch) * bytesPer
      if (bitsPerSample == 8) (data(off) & 0xff) - 128
      else {
        val u = (data(off) & 0xff) | ((data(off + 1) & 0xff) << 8)
        if (u >= 0x8000) u - 0x10000 else u
      }
    }
  }

  /**
   * RIFF/WAVE demuxer — the audio member of the RIFF family: validates
   * the RIFF/'WAVE' signature, parses the 'fmt ' chunk (PCM only,
   * audioFormat=1), and extracts the 'data' chunk, walking unknown
   * chunks ('LIST', 'fact', …) with the same WORD-alignment rule as
   * the AVI walk. No external codec: PCM *is* the samples.
   */
  object WavDemux {
    def read(bytes: Array[Byte]): WavPcm = {
      require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "WAVE",
        "not a WAV: bad RIFF signature")
      val riffEnd = math.min(bytes.length.toLong, 8 + le32(bytes, 4)).toInt
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None
      var data: Option[Array[Byte]] = None
      while (off + 8 <= riffEnd) {
        val id = fourcc(bytes, off)
        val size = le32(bytes, off + 4).toInt
        // Same negative-size guard as the AVI walk: a size >= 2^31 would
        // otherwise pass the overrun require (negative) and stall the loop.
        require(size >= 0, s"chunk '$id' at $off has invalid size $size")
        require(off + 8 + size <= riffEnd, s"chunk '$id' overruns RIFF")
        id match {
          case "fmt " =>
            require(size >= 16, "fmt chunk too short")
            val audioFormat = (le32(bytes, off + 8) & 0xffff).toInt
            require(audioFormat == 1, s"not PCM (audioFormat=$audioFormat)")
            val channels = ((le32(bytes, off + 8) >> 16) & 0xffff).toInt
            val sampleRate = le32(bytes, off + 12).toInt
            val bits = ((le32(bytes, off + 20) >> 16) & 0xffff).toInt
            require(bits == 8 || bits == 16, s"unsupported bits/sample: $bits")
            fmt = Some((sampleRate, channels, bits))
          case "data" =>
            data = Some(java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size))
          case _ => () // fact/LIST/cue — skipped, alignment still applies
        }
        off += 8 + size + (size & 1) // pad to WORD boundary
      }
      val (rate, ch, bits) = fmt.getOrElse(sys.error("not a WAV: no fmt chunk"))
      WavPcm(rate, ch, bits, data.getOrElse(sys.error("not a WAV: no data chunk")))
    }
  }

  /** Fixture-side WAV muxer: canonical RIFF('WAVE') with 'fmt ' +
    * 'data', per the public WAVE spec. An odd data length (8-bit WAVs
    * with an odd sample count) gets the mandatory pad byte. */
  object WavMux {
    def write(data: Array[Byte], sampleRate: Int, channels: Int,
              bitsPerSample: Int): Array[Byte] = {
      require(bitsPerSample == 8 || bitsPerSample == 16, "8/16-bit PCM only")
      val blockAlign = channels * bitsPerSample / 8
      val out = new ByteArrayOutputStream(data.length + 44)
      def le(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      }
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("RIFF".getBytes)
      le(4L + 24 + 8 + data.length + (data.length & 1))
      out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); le(16)
      le16(1); le16(channels); le(sampleRate.toLong)
      le(sampleRate.toLong * blockAlign); le16(blockAlign); le16(bitsPerSample)
      out.write("data".getBytes); le(data.length.toLong)
      out.write(data)
      if ((data.length & 1) == 1) out.write(0)
      out.toByteArray
    }
  }

  // ===================== YUV4MPEG2 (.y4m) ============================
  // The uncompressed frame-pipe format (what ffmpeg/x264 pipe between
  // stages): one ASCII header line "YUV4MPEG2 W.. H.. F.. .. C..\n",
  // then per frame an ASCII "FRAME...\n" marker followed by raw planar
  // pixel data. No compression at all, so the keystream oracle is
  // BIT-exact — unlike the lossy MJPEG path (m07).

  /** Fixture-side .y4m muxer. `colorspace` "mono" writes the single
    * gray plane; "420" appends two neutral (0x80) chroma planes at
    * ceil-half resolution (the spec's 4:2:0 layout for odd dims). */
  object Y4mMux {
    def write(frames: Seq[Array[Byte]], width: Int, height: Int,
              colorspace: String = "mono", fpsNum: Int = 30, fpsDen: Int = 1): Array[Byte] = {
      require(colorspace == "mono" || colorspace == "420", s"unsupported C$colorspace")
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val out = new ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C$colorspace\n"
        .getBytes(ascii))
      val chroma = new Array[Byte](((width + 1) / 2) * ((height + 1) / 2))
      java.util.Arrays.fill(chroma, 0x80.toByte) // neutral U/V
      frames.foreach { px =>
        require(px.length == width * height, "frame size mismatch")
        out.write("FRAME\n".getBytes(ascii))
        out.write(px)
        if (colorspace == "420") { out.write(chroma); out.write(chroma) }
      }
      out.toByteArray
    }
  }

  /** .y4m demuxer per the public grammar: header parameters are
    * space-separated tag-letter + value; frames are fixed-size planar
    * payloads after each FRAME marker line. Returns the LUMA plane of
    * every frame (chroma skipped — the engine's pixel model is gray). */
  object Y4mDemux {
    def frames(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val nl = bytes.indexOf('\n'.toByte)
      require(nl > 0, "not a y4m: missing header line")
      val header = new String(bytes, 0, nl, ascii)
      require(header.startsWith("YUV4MPEG2"), "not a y4m: bad magic")
      var w = -1; var h = -1
      var cs = "420" // the spec's default when no C tag is present
      header.split(' ').drop(1).foreach { p =>
        if (p.startsWith("W")) w = p.substring(1).toInt
        else if (p.startsWith("H")) h = p.substring(1).toInt
        else if (p.startsWith("C")) cs = p.substring(1)
      }
      require(w > 0 && h > 0, s"not a y4m: missing W/H in '$header'")
      val lumaLen = w * h
      val chromaHalf = ((w + 1) / 2) * ((h + 1) / 2)
      val frameLen =
        if (cs.startsWith("mono")) lumaLen
        else if (cs.startsWith("420")) lumaLen + 2 * chromaHalf
        else if (cs.startsWith("422")) lumaLen + 2 * ((w + 1) / 2) * h
        else if (cs.startsWith("444")) lumaLen * 3
        else sys.error(s"unsupported y4m colorspace C$cs")
      val out = Seq.newBuilder[Array[Byte]]
      var off = nl + 1
      while (off < bytes.length) {
        var eol = off
        while (eol < bytes.length && bytes(eol) != '\n'.toByte) eol += 1
        require(eol < bytes.length, "truncated y4m FRAME header")
        val line = new String(bytes, off, eol - off, ascii)
        require(line.startsWith("FRAME"), s"expected FRAME marker at $off, got '$line'")
        off = eol + 1
        require(off + frameLen <= bytes.length, "truncated y4m frame payload")
        out += java.util.Arrays.copyOfRange(bytes, off, off + lumaLen)
        off += frameLen
      }
      (w, h, out.result())
    }
  }

  // ========================= AIFF (IFF) ==============================
  // Apple's IFF-based PCM container: big-endian chunk sizes, COMM
  // (channels / frame count / bits / sample rate as an 80-bit extended
  // float) + SSND (offset, blockSize, then signed BIG-endian samples).
  // The byte-order mirror of WAV — a parser that confuses the two
  // fails both keystream oracles immediately.

  final case class AiffPcm(
      sampleRate: Int, channels: Int, bitsPerSample: Int, data: Array[Byte]) {
    def nSamples: Int = data.length / ((bitsPerSample / 8) * channels)
    /** Sample `k` of channel `ch` as signed (16-bit AIFF is signed BE). */
    def sample(k: Int, ch: Int = 0): Int = {
      val off = (k * channels + ch) * 2
      val u = ((data(off) & 0xff) << 8) | (data(off + 1) & 0xff)
      if (u >= 0x8000) u - 0x10000 else u
    }
  }

  /** 80-bit extended-precision encode of a positive integer sample
    * rate (IEEE 754 extended: 15-bit biased exponent, explicit-1
    * 64-bit mantissa) — the COMM chunk's one quirk. */
  private[multimodal] def extended80(rate: Int): Array[Byte] = {
    require(rate > 0, "rate must be positive")
    val p = 31 - Integer.numberOfLeadingZeros(rate) // highest set bit
    val exponent = 16383 + p
    val mantissa = rate.toLong << (63 - p) // MSB becomes the explicit 1
    val out = new Array[Byte](10)
    out(0) = ((exponent >> 8) & 0xff).toByte
    out(1) = (exponent & 0xff).toByte
    var i = 0
    while (i < 8) { out(2 + i) = ((mantissa >>> (56 - 8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  private[multimodal] def readExtended80(b: Array[Byte], off: Int): Int = {
    val exponent = ((b(off) & 0x7f) << 8) | (b(off + 1) & 0xff)
    var mantissa = 0L
    var i = 0
    while (i < 8) { mantissa = (mantissa << 8) | (b(off + 2 + i) & 0xff); i += 1 }
    val p = exponent - 16383
    require(p >= 0 && p < 63, s"unsupported extended-float exponent $exponent")
    (mantissa >>> (63 - p)).toInt
  }

  object AiffDemux {
    def read(bytes: Array[Byte]): AiffPcm = {
      require(bytes.length >= 12 && fourcc(bytes, 0) == "FORM" && fourcc(bytes, 8) == "AIFF",
        "not an AIFF: bad FORM signature")
      val formEnd = math.min(bytes.length.toLong, 8 + be32(bytes, 4)).toInt
      var off = 12
      var comm: Option[(Int, Int, Int)] = None // (channels, bits, rate)
      var data: Option[Array[Byte]] = None
      while (off + 8 <= formEnd) {
        val id = fourcc(bytes, off)
        val size = be32(bytes, off + 4).toInt
        require(size >= 0, s"chunk '$id' at $off has invalid size $size")
        require(off + 8 + size <= formEnd, s"chunk '$id' overruns FORM")
        id match {
          case "COMM" =>
            require(size >= 18, "COMM chunk too short")
            val channels = (((bytes(off + 8) & 0xff) << 8) | (bytes(off + 9) & 0xff))
            val bits = (((bytes(off + 14) & 0xff) << 8) | (bytes(off + 15) & 0xff))
            require(bits == 16, s"unsupported bits/sample: $bits (16-bit AIFF only)")
            comm = Some((channels, bits, readExtended80(bytes, off + 16)))
          case "SSND" =>
            require(size >= 8, "SSND chunk too short")
            val dataOff = be32(bytes, off + 8).toInt
            require(dataOff >= 0 && dataOff <= size - 8, s"bad SSND offset $dataOff")
            data = Some(java.util.Arrays.copyOfRange(
              bytes, off + 16 + dataOff, off + 8 + size))
          case _ => () // NAME/ANNO/etc — skipped, pad alignment applies
        }
        off += 8 + size + (size & 1) // IFF chunks pad to even, like RIFF
      }
      val (ch, bits, rate) = comm.getOrElse(sys.error("not an AIFF: no COMM chunk"))
      AiffPcm(rate, ch, bits, data.getOrElse(sys.error("not an AIFF: no SSND chunk")))
    }
  }

  /** Fixture-side AIFF muxer: FORM('AIFF') with COMM + SSND, signed
    * big-endian 16-bit samples, 80-bit extended sample rate. */
  object AiffMux {
    def write(data: Array[Byte], sampleRate: Int, channels: Int,
              bitsPerSample: Int): Array[Byte] = {
      require(bitsPerSample == 16, "16-bit PCM only (signed BE per the spec)")
      val out = new ByteArrayOutputStream(data.length + 54)
      def b32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      def b16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      val ssndSize = 8 + data.length
      out.write("FORM".getBytes)
      b32(4L + 8 + 18 + 8 + ssndSize + (data.length & 1))
      out.write("AIFF".getBytes)
      out.write("COMM".getBytes); b32(18)
      b16(channels); b32(data.length.toLong / (channels * 2)); b16(bitsPerSample)
      out.write(extended80(sampleRate))
      out.write("SSND".getBytes); b32(ssndSize.toLong); b32(0); b32(0)
      out.write(data)
      if ((data.length & 1) == 1) out.write(0)
      out.toByteArray
    }
  }
}
