package graft.queries

import graft.multimodal.{MediaRow, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Multimodal plumbing behind a driver oracle (VERDICT r6 item 7: the
 * image-decode path previously had only ScalaTest evidence).
 *
 * The trick that makes a REAL (non-pinned) oracle possible: the
 * fixture pixels are the [[Multimodal.FakeCodec]] md5 keystream —
 * reproducible in DuckDB SQL with `md5()` — and those pixels travel
 * through a REAL `javax.imageio` PNG encode on the driver side of the
 * fixture and a REAL decode inside the production `mapPartitions`
 * feature extractor. Gray 8-bit PNG is lossless, so any decode bug
 * (gamma curve, palette confusion, sample truncation) shows up as a
 * hash mismatch against the keystream-derived expectation.
 */
object QMedia {

  /** 24 variable-sized single-frame grayscale PNGs, pixels from the
    * md5 keystream; metadata width/height deliberately 0 so the only
    * source of dimensions is the payload decode. */
  def imageMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(24).as[Long].map { i =>
      val w = (4 + i % 5).toInt
      val h = (3 + i % 4).toInt
      val px = Multimodal.FakeCodec.encode(s"img:$i", w, h, 1)
      MediaRow(i, "image", Multimodal.ImageIoCodec.encodePng(w, h, px),
        0, 0, 1, "image/png")
    }
  }

  /** 12 animated GIFs (2–4 keystream frames each), a REAL multi-frame
    * container for the video-shaped decode path; metadata dims zeroed
    * as in [[imageMedia]]. */
  def gifMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(12).as[Long].map { i =>
      val w = (5 + i % 3).toInt
      val h = (4 + i % 2).toInt
      val nf = (2 + i % 3).toInt
      val frames = (0 until nf).map(f => Multimodal.FakeCodec.encode(s"gif:$i:$f", w, h, 1))
      MediaRow(i, "video", Multimodal.ImageIoCodec.encodeGif(w, h, frames),
        0, 0, nf, "image/gif")
    }
  }

  /** 10 MP4 containers (2–4 keystream PNG samples each) through the
    * REAL ISO-BMFF mux: the demux side must walk moov/trak/stbl and
    * reconstruct the samples from stsc/stsz/stco to get the pixels
    * back. PNG samples are lossless, so the keystream oracle is
    * bit-exact. Metadata dims zeroed as in [[imageMedia]]. */
  def mp4Media(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(10).as[Long].map { i =>
      val w = (5 + i % 3).toInt
      val h = (4 + i % 2).toInt
      val nf = (2 + i % 3).toInt
      val samples = (0 until nf).map { f =>
        Multimodal.ImageIoCodec.encodePng(w, h,
          Multimodal.FakeCodec.encode(s"mp4:$i:$f", w, h, 1))
      }
      MediaRow(i, "video",
        graft.multimodal.VideoContainers.Mp4Mux.write(samples, w, h, compressor = "png "),
        0, 0, nf, "video/mp4")
    }
  }

  /** 10 AVI containers through the REAL RIFF mux — same keystream
    * frames with an `avi:` seed, demuxed by the movi-list chunk walk
    * (odd-size PNG chunks exercise the WORD-alignment pad). */
  def aviMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(10).as[Long].map { i =>
      val w = (5 + i % 3).toInt
      val h = (4 + i % 2).toInt
      val nf = (2 + i % 3).toInt
      val samples = (0 until nf).map { f =>
        Multimodal.ImageIoCodec.encodePng(w, h,
          Multimodal.FakeCodec.encode(s"avi:$i:$f", w, h, 1))
      }
      MediaRow(i, "video",
        graft.multimodal.VideoContainers.AviMux.write(samples, w, h, fourccCodec = "PNG "),
        0, 0, nf, "video/avi")
    }
  }

  /** 20 MJPEG containers — JPEG frames (the codec real MJPEG files
    * actually carry) through BOTH real muxes: ids 0–9 RIFF/AVI
    * (fourcc `MJPG`), ids 10–19 ISO-BMFF/MP4 (compressor `jpeg`).
    * JPEG is lossy, so unlike the PNG fixtures the keystream oracle
    * is tolerance-gated, not bit-exact (see `m07`). Dims are
    * multiples of 8 (whole DCT blocks — no partial-block edge
    * effects on the mean); metadata dims zeroed as in
    * [[imageMedia]], so decoded dimensions can only come from the
    * JPEG payload itself. */
  def mjpegMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(20).as[Long].map { i =>
      val w = (16 + (i % 3) * 8).toInt
      val h = (16 + (i % 2) * 8).toInt
      val nf = (2 + i % 3).toInt
      val frames = (0 until nf).map { f =>
        Multimodal.ImageIoCodec.encodeJpeg(w, h,
          Multimodal.FakeCodec.encode(s"mjpg:$i:$f", w, h, 1))
      }
      if (i < 10)
        MediaRow(i, "video",
          graft.multimodal.VideoContainers.AviMux.write(frames, w, h, fourccCodec = "MJPG"),
          0, 0, nf, "video/avi")
      else
        MediaRow(i, "video",
          graft.multimodal.VideoContainers.Mp4Mux.write(frames, w, h, compressor = "jpeg"),
          0, 0, nf, "video/mp4")
    }
  }

  /** 10 PCM WAVs through the REAL RIFF/WAVE mux: 16-bit mono
    * little-endian keystream samples — the demux side must parse
    * 'fmt ', locate 'data', and reassemble signed samples from byte
    * pairs. */
  def wavMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(10).as[Long].map { i =>
      val nSamples = (100 + i * 10).toInt
      val pcm = Multimodal.FakeCodec.encode(s"wav:$i", nSamples * 2, 1, 1)
      MediaRow(i, "audio",
        graft.multimodal.VideoContainers.WavMux.write(
          pcm, sampleRate = 8000 + i.toInt * 100, channels = 1, bitsPerSample = 16),
        0, 0, 0, "audio/wav")
    }
  }

  /** 12 YUV4MPEG2 streams — the UNCOMPRESSED frame-pipe format, so
    * the keystream oracle is bit-exact (no codec layer). Even ids are
    * Cmono (single gray plane), odd ids C420 with neutral chroma the
    * demux must skip at ceil-half resolution (dims here are odd on
    * purpose). Metadata dims zeroed as everywhere. */
  def y4mMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(12).as[Long].map { i =>
      val w = (5 + i % 3).toInt
      val h = (4 + i % 2).toInt
      val nf = (2 + i % 3).toInt
      val frames = (0 until nf).map(f =>
        Multimodal.FakeCodec.encode(s"y4m:$i:$f", w, h, 1))
      val cs = if (i % 2 == 0) "mono" else "420"
      MediaRow(i, "video",
        graft.multimodal.VideoContainers.Y4mMux.write(frames, w, h, colorspace = cs),
        0, 0, nf, "video/y4m")
    }
  }

  /** 10 AIFF containers — the big-endian mirror of [[wavMedia]]: same
    * keystream byte stream with an `aif:` seed, signed 16-bit BE
    * samples, sample rate through the 80-bit extended float. */
  def aiffMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(10).as[Long].map { i =>
      val nSamples = (100 + i * 10).toInt
      val pcm = Multimodal.FakeCodec.encode(s"aif:$i", nSamples * 2, 1, 1)
      MediaRow(i, "audio",
        graft.multimodal.VideoContainers.AiffMux.write(
          pcm, sampleRate = 8000 + i.toInt * 100, channels = 1, bitsPerSample = 16),
        0, 0, 0, "audio/aiff")
    }
  }

  /** 12 SubRip transcripts (2–5 cues each) through the canonical SRT
    * writer: index line, `HH:MM:SS,mmm --> HH:MM:SS,mmm` time line,
    * one or two text lines. Cue times are id-derived arithmetic the
    * oracle recomputes directly — the ENGINE must recover them by
    * parsing the formatted time strings back. */
  def srtMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(12).as[Long].map { i =>
      val nc = (2 + i % 4).toInt
      val cues = (0 until nc).map { k =>
        val start = i * 60000L + k * 3000L + (k * 37) % 1000
        val end = start + 2000L + (k * 53) % 500
        val text =
          if (k % 2 == 1) s"cue $i:$k\nline two $k" else s"cue $i:$k"
        (k + 1, start, end, text)
      }
      MediaRow(i, "text", graft.multimodal.Subtitles.writeSrt(cues),
        0, 0, nc, "text/srt")
    }
  }

  /** Transcripts matched to the [[y4mMedia]] clips for the alignment
    * query: media `i` carries `2 + i % 4` cues, cue `j` active over
    * [j·150 ms, j·150+200 ms) — windows chosen to overlap the frame
    * instants, which m11 DERIVES as frame k ↦ k·100 ms (the y4m
    * header's F tag is not consumed by the demux; the 100 ms spacing
    * is the query's own convention, applied identically on the
    * oracle side) in 0/1/2-cue patterns. */
  def alignSrtMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(12).as[Long].map { i =>
      val nc = (2 + i % 4).toInt
      val cues = (0 until nc).map { j =>
        (j + 1, j * 150L, j * 150L + 200L, s"c $i:$j")
      }
      MediaRow(i, "text", graft.multimodal.Subtitles.writeSrt(cues),
        0, 0, nc, "text/srt")
    }
  }

  /** The [[imageMedia]] originals (ids 0–23) plus a perturbed re-encode
    * of each at id 100+i — pixel j bumped by +2 (clamped) when j%5==0,
    * then through the SAME lossless PNG round-trip. The m12 fixture:
    * byte-distinct payloads whose dHash codes sit within a few bits of
    * their originals, the retouch/re-encode shape perceptual hashing
    * exists to catch. */
  def imageDupMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(48).as[Long].map { k =>
      val src = k % 24
      val w = (4 + src % 5).toInt
      val h = (3 + src % 4).toInt
      val px = Multimodal.FakeCodec.encode(s"img:$src", w, h, 1)
      val out =
        if (k < 24) px
        else px.zipWithIndex.map { case (b, j) =>
          math.min(255, (b & 0xff) + (if (j % 5 == 0) 2 else 0)).toByte
        }
      MediaRow(if (k < 24) src else 100 + src, "image",
        Multimodal.ImageIoCodec.encodePng(w, h, out), 0, 0, 1, "image/png")
    }
  }

  /** The [[y4mMedia]] clips (ids 0–11) plus a perturbed re-encode of
    * each at id 100+i — every pixel bumped +2 (clamped) when j%5==0,
    * and every THIRD source additionally DROPS its last frame — the
    * m13 fixture: re-encoded/trimmed copies of the same clip, byte-
    * distinct but frame-hash-near. y4m is uncompressed, so the
    * keystream oracle replays the luma exactly. */
  def y4mDupMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(24).as[Long].map { k =>
      val src = k % 12
      val w = (5 + src % 3).toInt
      val h = (4 + src % 2).toInt
      val nf0 = (2 + src % 3).toInt
      val pert = k >= 12
      val nf = if (pert && src % 3 == 0) nf0 - 1 else nf0
      val frames = (0 until nf).map { f =>
        val px = Multimodal.FakeCodec.encode(s"y4m:$src:$f", w, h, 1)
        if (!pert) px
        else px.zipWithIndex.map { case (b, j) =>
          math.min(255, (b & 0xff) + (if (j % 5 == 0) 2 else 0)).toByte
        }
      }
      val cs = if (src % 2 == 0) "mono" else "420"
      MediaRow(if (pert) 100 + src else src, "video",
        graft.multimodal.VideoContainers.Y4mMux.write(frames, w, h, colorspace = cs),
        0, 0, nf, "video/y4m")
    }
  }

  /** The m14 fixture: original clips (ids 0–9, 120+10·src samples)
    * plus three copy families per source — a byte-perturbed re-encode
    * at id 100+src (every 5th PCM byte bumped +2, clamped: block
    * energies shift a little but the adjacent-louder bits rarely
    * flip), a 1-SAMPLE head-trim at 200+src, and a 3-sample head-trim
    * at 300+src. The trims exercise the dense sub-fingerprint grid:
    * no block-aligned (or half-block) code of a trimmed copy matches
    * the original, but its window at position p IS the original's at
    * p+1 (resp. p+3), so the run-consistent matcher finds a long
    * exact run at delta 1 / 3. */
  def wavDupMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(40).as[Long].map { k =>
      val src = k % 10
      val nSamples = (120 + src * 10).toInt
      val pcm0 = Multimodal.FakeCodec.encode(s"wav:$src", nSamples * 2, 1, 1)
      val (id, pcm) = (k / 10) match {
        case 0 => (src, pcm0)
        case 1 => (100 + src, pcm0.zipWithIndex.map { case (b, j) =>
          math.min(255, (b & 0xff) + (if (j % 5 == 0) 2 else 0)).toByte
        })
        case 2 => (200 + src, pcm0.drop(2)) // head-trim 1 sample (16-bit)
        case _ => (300 + src, pcm0.drop(6)) // head-trim 3 samples
      }
      MediaRow(id, "audio",
        graft.multimodal.VideoContainers.WavMux.write(
          pcm, sampleRate = 8000 + src.toInt * 100, channels = 1, bitsPerSample = 16),
        0, 0, 0, "audio/wav")
    }
  }

  /** The m17 history corpus: the ten [[wavDupMedia]] ORIGINALS. */
  def wavHistMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(10).as[Long].map { src =>
      val nSamples = (120 + src * 10).toInt
      MediaRow(src, "audio",
        graft.multimodal.VideoContainers.WavMux.write(
          Multimodal.FakeCodec.encode(s"wav:$src", nSamples * 2, 1, 1),
          sampleRate = 8000 + src.toInt * 100, channels = 1, bitsPerSample = 16),
        0, 0, 0, "audio/wav")
    }
  }

  /** The m17 DAY-1 ingest batch: perturbed copies of the history clips
    * (ids 100+src — near-dups at delta 0) plus six genuinely NOVEL
    * clips at ids 200+i (fresh keystream seeds wav:50+i). */
  def wavIngestMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(16).as[Long].map { k =>
      if (k < 10) {
        val src = k
        val nSamples = (120 + src * 10).toInt
        val pcm = Multimodal.FakeCodec.encode(s"wav:$src", nSamples * 2, 1, 1)
          .zipWithIndex.map { case (b, j) =>
            math.min(255, (b & 0xff) + (if (j % 5 == 0) 2 else 0)).toByte
          }
        MediaRow(100 + src, "audio",
          graft.multimodal.VideoContainers.WavMux.write(
            pcm, sampleRate = 8000 + src.toInt * 100, channels = 1, bitsPerSample = 16),
          0, 0, 0, "audio/wav")
      } else {
        val i = k - 10
        val nSamples = (120 + i * 10).toInt
        MediaRow(200 + i, "audio",
          graft.multimodal.VideoContainers.WavMux.write(
            Multimodal.FakeCodec.encode(s"wav:${50 + i}", nSamples * 2, 1, 1),
            sampleRate = 8000, channels = 1, bitsPerSample = 16),
          0, 0, 0, "audio/wav")
      }
    }
  }

  /** The m17 DAY-2 ingest batch: HEAD-TRIMMED (2 samples) copies of
    * the day-1 NOVELS (ids 300+i — they only drop if the day-1 upsert
    * really landed, and only via a delta-2 run, never a code-equal
    * block grid) plus four genuinely novel clips at ids 400+j (fresh
    * keystream seeds wav:80+j). */
  def wavIngestMediaB(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(10).as[Long].map { k =>
      if (k < 6) {
        val i = k
        val nSamples = (120 + i * 10).toInt
        MediaRow(300 + i, "audio",
          graft.multimodal.VideoContainers.WavMux.write(
            Multimodal.FakeCodec.encode(s"wav:${50 + i}", nSamples * 2, 1, 1).drop(4),
            sampleRate = 8000, channels = 1, bitsPerSample = 16),
          0, 0, 0, "audio/wav")
      } else {
        val j = k - 6
        val nSamples = (120 + j * 10).toInt
        MediaRow(400 + j, "audio",
          graft.multimodal.VideoContainers.WavMux.write(
            Multimodal.FakeCodec.encode(s"wav:${80 + j}", nSamples * 2, 1, 1),
            sampleRate = 8000, channels = 1, bitsPerSample = 16),
          0, 0, 0, "audio/wav")
      }
    }
  }

  /** The m15 INGEST batch: the 24 perturbed copies of [[imageMedia]]
    * (ids 100+i — near-dups of the history) plus 12 genuinely NOVEL
    * images at ids 200+i (fresh keystream seeds img:50+i). */
  def imageIngestMedia(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(36).as[Long].map { k =>
      if (k < 24) {
        val src = k
        val w = (4 + src % 5).toInt
        val h = (3 + src % 4).toInt
        val px = Multimodal.FakeCodec.encode(s"img:$src", w, h, 1)
          .zipWithIndex.map { case (b, j) =>
            math.min(255, (b & 0xff) + (if (j % 5 == 0) 2 else 0)).toByte
          }
        MediaRow(100 + src, "image", Multimodal.ImageIoCodec.encodePng(w, h, px),
          0, 0, 1, "image/png")
      } else {
        val src = 50 + (k - 24)
        val w = (4 + src % 5).toInt
        val h = (3 + src % 4).toInt
        val px = Multimodal.FakeCodec.encode(s"img:$src", w, h, 1)
        MediaRow(200 + (k - 24), "image", Multimodal.ImageIoCodec.encodePng(w, h, px),
          0, 0, 1, "image/png")
      }
    }
  }

  /** The m16 DAY-2 ingest batch: perturbed copies of the m15 NOVELS
    * (ids 300+i — near-dups of exactly what day 1 ACCEPTED, so they
    * only drop if the day-1 upsert really landed) plus 8 genuinely
    * novel images at ids 400+j (fresh keystream seeds img:80+j). */
  def imageIngestMediaB(s: SparkSession): org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    s.range(20).as[Long].map { k =>
      if (k < 12) {
        val src = 50 + k
        val w = (4 + src % 5).toInt
        val h = (3 + src % 4).toInt
        val px = Multimodal.FakeCodec.encode(s"img:$src", w, h, 1)
          .zipWithIndex.map { case (b, j) =>
            math.min(255, (b & 0xff) + (if (j % 5 == 0) 2 else 0)).toByte
          }
        MediaRow(300 + k, "image", Multimodal.ImageIoCodec.encodePng(w, h, px),
          0, 0, 1, "image/png")
      } else {
        val src = 80 + (k - 12)
        val w = (4 + src % 5).toInt
        val h = (3 + src % 4).toInt
        val px = Multimodal.FakeCodec.encode(s"img:$src", w, h, 1)
        MediaRow(400 + (k - 12), "image", Multimodal.ImageIoCodec.encodePng(w, h, px),
          0, 0, 1, "image/png")
      }
    }
  }

  /** The m02-shaped per-frame integer stats oracle, parameterized by
    * keystream seed prefix (the only thing that differs between the
    * GIF, MP4, and AVI fixtures). */
  private def frameStatsOracle(seedPrefix: String): String =
    s"""WITH m AS (SELECT i AS media_id, CAST(5 + i % 3 AS INT) AS w,
       |    CAST(4 + i % 2 AS INT) AS h, CAST(2 + i % 3 AS INT) AS nf
       |  FROM range(10) t(i)),
       |fr AS (SELECT media_id, w, h, f FROM m, range(4) t(f) WHERE f < nf),
       |px AS (SELECT media_id, f, w, h, j,
       |    ('0x' || substr(md5('$seedPrefix:' || media_id || ':' || f || ':' || CAST(j // 16 AS BIGINT)),
       |                    CAST(2*(j % 16)+1 AS INT), 2))::INT AS v
       |  FROM fr, range(40) t(j) WHERE j < w * h)
       |SELECT media_id, CAST(f AS INT) AS frame_idx,
       |  CAST(w * h AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS px_sum,
       |  CAST(SUM((v // 16) + 1) AS BIGINT) AS hist_checksum
       |FROM px GROUP BY media_id, f, w * h
       |ORDER BY media_id, frame_idx""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // Integer micro-unit summary of the decoded features: pixel mean
    // and std quantized to 1e-6 (s, s2, n are integer-exact in double,
    // and no value can land on a .5 rounding boundary: the fractional
    // part of s*1e6/n is a multiple of 1/n for every n = w*h in play),
    // plus a histogram checksum recovered from the embedding — the
    // float h/n round-trips exactly at n ≤ 48.
    QueryDef.of("m01_image_decode_features",
      """WITH m AS (SELECT i AS media_id, CAST(4 + i % 5 AS INT) AS w, CAST(3 + i % 4 AS INT) AS h
        |  FROM range(24) t(i)),
        |px AS (SELECT media_id, w, h, j,
        |    ('0x' || substr(md5('img:' || media_id || ':' || CAST(j // 16 AS BIGINT)),
        |                    CAST(2*(j % 16)+1 AS INT), 2))::INT AS v
        |  FROM m, range(48) t(j) WHERE j < w * h),
        |st AS (SELECT media_id, w * h AS n_px, SUM(v) AS s,
        |    SUM(CAST(v AS DOUBLE) * v) AS s2, SUM((v // 16) + 1) AS hist_checksum
        |  FROM px GROUP BY media_id, w * h)
        |SELECT media_id, CAST(1 AS BIGINT) AS n_frames,
        |  CAST(round(s / CAST(n_px AS DOUBLE) * 1e6) AS BIGINT) AS mean_micro,
        |  CAST(round(sqrt(greatest(0, s2 / n_px
        |    - (s / CAST(n_px AS DOUBLE)) * (s / CAST(n_px AS DOUBLE)))) * 1e6) AS BIGINT) AS std_micro,
        |  CAST(n_px AS BIGINT) AS n_px, CAST(hist_checksum AS BIGINT) AS hist_checksum
        |FROM st ORDER BY media_id""".stripMargin) { (s, dir) =>
      val feats = Multimodal.extractFeatures(imageMedia(s))
      feats.toDF()
        .withColumn("n_px",
          ((col("media_id") % 5 + 4) * (col("media_id") % 4 + 3)).cast("long"))
        .select(col("media_id"), col("n_frames").cast("long"),
          round(col("mean_px") * 1e6).cast("long").as("mean_micro"),
          round(col("std_px") * 1e6).cast("long").as("std_micro"),
          col("n_px"),
          posexplode(col("embedding")).as(Seq("pos", "e")))
        .groupBy("media_id", "n_frames", "mean_micro", "std_micro", "n_px")
        .agg(sum((col("pos") + 1) * round(col("e") * col("n_px"))).cast("long")
          .as("hist_checksum"))
        .orderBy("media_id")
    },

    // REAL multi-frame container decode (animated GIF through the
    // JDK's sequence reader) gated per FRAME: sampleFrames must yield
    // every container frame with the exact keystream pixels — a frame
    // ordering, palette, or sequence-parse bug lands as a mismatch.
    // Integer-only stats (pixel sum + histogram checksum), so the
    // oracle is keystream-derived with no float concerns at all.
    QueryDef.of("m02_gif_frame_stats",
      """WITH m AS (SELECT i AS media_id, CAST(5 + i % 3 AS INT) AS w,
        |    CAST(4 + i % 2 AS INT) AS h, CAST(2 + i % 3 AS INT) AS nf
        |  FROM range(12) t(i)),
        |fr AS (SELECT media_id, w, h, f FROM m, range(4) t(f) WHERE f < nf),
        |px AS (SELECT media_id, f, w, h, j,
        |    ('0x' || substr(md5('gif:' || media_id || ':' || f || ':' || CAST(j // 16 AS BIGINT)),
        |                    CAST(2*(j % 16)+1 AS INT), 2))::INT AS v
        |  FROM fr, range(40) t(j) WHERE j < w * h)
        |SELECT media_id, CAST(f AS INT) AS frame_idx,
        |  CAST(w * h AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS px_sum,
        |  CAST(SUM((v // 16) + 1) AS BIGINT) AS hist_checksum
        |FROM px GROUP BY media_id, f, w * h
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      Multimodal.sampleFrames(gifMedia(s), everyN = 1)
        .map { f =>
          var pxSum = 0L; var hist = 0L
          f.pixels.foreach { b => val v = b & 0xff; pxSum += v; hist += (v >> 4) + 1 }
          (f.media_id, f.frame_idx, f.width.toLong * f.height, pxSum, hist)
        }
        .toDF("media_id", "frame_idx", "n_px", "px_sum", "hist_checksum")
        .orderBy("media_id", "frame_idx")
    },

    // The sampling STRIDE oracle-gated too (VERDICT r7 item 8):
    // sampleFrames(everyN=2) must keep exactly the even container
    // frames with unchanged pixels — the m02 keystream oracle
    // restricted to f % 2 = 0. An off-by-one in the stride (keeping
    // odd frames, or 1-based indexing) flips every kept row.
    QueryDef.of("m03_gif_frame_sample",
      """WITH m AS (SELECT i AS media_id, CAST(5 + i % 3 AS INT) AS w,
        |    CAST(4 + i % 2 AS INT) AS h, CAST(2 + i % 3 AS INT) AS nf
        |  FROM range(12) t(i)),
        |fr AS (SELECT media_id, w, h, f FROM m, range(4) t(f)
        |  WHERE f < nf AND f % 2 = 0),
        |px AS (SELECT media_id, f, w, h, j,
        |    ('0x' || substr(md5('gif:' || media_id || ':' || f || ':' || CAST(j // 16 AS BIGINT)),
        |                    CAST(2*(j % 16)+1 AS INT), 2))::INT AS v
        |  FROM fr, range(40) t(j) WHERE j < w * h)
        |SELECT media_id, CAST(f AS INT) AS frame_idx,
        |  CAST(w * h AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS px_sum,
        |  CAST(SUM((v // 16) + 1) AS BIGINT) AS hist_checksum
        |FROM px GROUP BY media_id, f, w * h
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      Multimodal.sampleFrames(gifMedia(s), everyN = 2)
        .map { f =>
          var pxSum = 0L; var hist = 0L
          f.pixels.foreach { b => val v = b & 0xff; pxSum += v; hist += (v >> 4) + 1 }
          (f.media_id, f.frame_idx, f.width.toLong * f.height, pxSum, hist)
        }
        .toDF("media_id", "frame_idx", "n_px", "px_sum", "hist_checksum")
        .orderBy("media_id", "frame_idx")
    },

    // REAL MP4 container demux gated per frame: the ISO-BMFF sample
    // reconstruction (stsc runs × stsz sizes × stco offsets) must
    // yield every PNG sample with exact keystream pixels — an
    // off-by-one anywhere in the chunk walk corrupts or drops frames.
    QueryDef.of("m04_mp4_demux_frames", frameStatsOracle("mp4")) { (s, dir) =>
      import s.implicits._
      Multimodal.sampleFrames(mp4Media(s), everyN = 1)
        .map { f =>
          var pxSum = 0L; var hist = 0L
          f.pixels.foreach { b => val v = b & 0xff; pxSum += v; hist += (v >> 4) + 1 }
          (f.media_id, f.frame_idx, f.width.toLong * f.height, pxSum, hist)
        }
        .toDF("media_id", "frame_idx", "n_px", "px_sum", "hist_checksum")
        .orderBy("media_id", "frame_idx")
    },

    // REAL AVI container demux gated per frame: the RIFF movi-list
    // walk (including WORD-alignment padding after odd-size chunks)
    // against the same keystream expectation.
    QueryDef.of("m05_avi_demux_frames", frameStatsOracle("avi")) { (s, dir) =>
      import s.implicits._
      Multimodal.sampleFrames(aviMedia(s), everyN = 1)
        .map { f =>
          var pxSum = 0L; var hist = 0L
          f.pixels.foreach { b => val v = b & 0xff; pxSum += v; hist += (v >> 4) + 1 }
          (f.media_id, f.frame_idx, f.width.toLong * f.height, pxSum, hist)
        }
        .toDF("media_id", "frame_idx", "n_px", "px_sum", "hist_checksum")
        .orderBy("media_id", "frame_idx")
    },

    // REAL MJPEG decode through both containers (VERDICT r8 item 6):
    // JPEG frames demuxed from AVI (fourcc MJPG) and MP4 (compressor
    // 'jpeg') and decoded by the actual JPEG codec path. JPEG is
    // lossy, so the gate is tolerance-shaped: decoded dimensions and
    // frame count are exact output columns, and `luma_ok` asserts the
    // decoded mean luma lands within ±2 of the keystream source mean
    // (the DC term survives quantization; a gamma, sign, channel, or
    // sample-reassembly bug shifts it far beyond 2). The oracle
    // derives the exact columns from the fixture grammar and pins
    // luma_ok TRUE — a tolerance miss flips the value and fails the
    // hash compare.
    QueryDef.of("m07_mjpeg_decode",
      """WITH m AS (SELECT i AS media_id,
        |    CASE WHEN i < 10 THEN 'avi' ELSE 'mp4' END AS container,
        |    CAST(16 + (i % 3) * 8 AS INT) AS w,
        |    CAST(16 + (i % 2) * 8 AS INT) AS h,
        |    CAST(2 + i % 3 AS INT) AS nf
        |  FROM range(20) t(i))
        |SELECT media_id, container, CAST(f AS INT) AS frame_idx,
        |  w AS width, h AS height, TRUE AS luma_ok
        |FROM m, range(4) t(f) WHERE f < nf
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      Multimodal.sampleFrames(mjpegMedia(s), everyN = 1)
        .map { fr =>
          var sum = 0L
          fr.pixels.foreach(b => sum += (b & 0xff))
          val measured = sum.toDouble / (fr.width * fr.height)
          // the same keystream the fixture encoded, at the DECODED
          // dims — wrong dims shift both the width column and the
          // expectation, failing the compare twice over
          val src = Multimodal.FakeCodec.encode(
            s"mjpg:${fr.media_id}:${fr.frame_idx}", fr.width, fr.height, 1)
          var esum = 0L
          src.foreach(b => esum += (b & 0xff))
          val expected = esum.toDouble / (fr.width * fr.height)
          (fr.media_id, if (fr.media_id < 10) "avi" else "mp4", fr.frame_idx,
            fr.width, fr.height, math.abs(measured - expected) <= 2.0)
        }
        .toDF("media_id", "container", "frame_idx", "width", "height", "luma_ok")
        .orderBy("media_id", "frame_idx")
    },

    // REAL WAV (RIFF/WAVE PCM) parse gated per payload: the demux must
    // read 'fmt ', find 'data', and reassemble SIGNED 16-bit LE
    // samples from the keystream byte pairs — a byte-order or sign
    // mistake shifts sum_abs/peak_abs immediately. The oracle
    // reconstructs the same md5 keystream and the same LE pairing.
    QueryDef.of("m06_wav_audio_stats",
      """WITH m AS (SELECT i AS media_id, CAST(100 + i * 10 AS BIGINT) AS n
        |  FROM range(10) t(i)),
        |by AS (SELECT media_id, n, j,
        |    ('0x' || substr(md5('wav:' || media_id || ':' || CAST(j // 16 AS BIGINT)),
        |                    CAST(2*(j % 16)+1 AS INT), 2))::INT AS b
        |  FROM m, range(400) t(j) WHERE j < n * 2),
        |s16 AS (SELECT media_id, n, j // 2 AS k,
        |    SUM(CASE WHEN j % 2 = 0 THEN b ELSE 256 * b END) AS u
        |  FROM by GROUP BY media_id, n, j // 2),
        |v AS (SELECT media_id, n,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
        |  FROM s16)
        |SELECT media_id, n AS n_samples,
        |  CAST(8000 + media_id * 100 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels, CAST(16 AS INT) AS bits_per_sample,
        |  CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs
        |FROM v GROUP BY media_id, n
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.wavStats(wavMedia(s))
        .toDF()
        .orderBy("media_id")
    },

    // UNCOMPRESSED video through the real YUV4MPEG2 grammar: header
    // parse, FRAME markers, fixed-size planar payloads, chroma skip
    // on the C420 half (odd dims → ceil-half planes). No codec layer,
    // so unlike m07 the keystream gate is bit-exact per frame.
    QueryDef.of("m08_y4m_frame_stats",
      """WITH m AS (SELECT i AS media_id, CAST(5 + i % 3 AS INT) AS w,
        |    CAST(4 + i % 2 AS INT) AS h, CAST(2 + i % 3 AS INT) AS nf
        |  FROM range(12) t(i)),
        |fr AS (SELECT media_id, w, h, f FROM m, range(4) t(f) WHERE f < nf),
        |px AS (SELECT media_id, f, w, h, j,
        |    ('0x' || substr(md5('y4m:' || media_id || ':' || f || ':' || CAST(j // 16 AS BIGINT)),
        |                    CAST(2*(j % 16)+1 AS INT), 2))::INT AS v
        |  FROM fr, range(40) t(j) WHERE j < w * h)
        |SELECT media_id, CAST(f AS INT) AS frame_idx,
        |  CAST(w * h AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS px_sum,
        |  CAST(SUM((v // 16) + 1) AS BIGINT) AS hist_checksum
        |FROM px GROUP BY media_id, f, w * h
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      Multimodal.sampleFrames(y4mMedia(s), everyN = 1)
        .map { f =>
          var pxSum = 0L; var hist = 0L
          f.pixels.foreach { b => val v = b & 0xff; pxSum += v; hist += (v >> 4) + 1 }
          (f.media_id, f.frame_idx, f.width.toLong * f.height, pxSum, hist)
        }
        .toDF("media_id", "frame_idx", "n_px", "px_sum", "hist_checksum")
        .orderBy("media_id", "frame_idx")
    },

    // REAL AIFF (IFF big-endian PCM) parse — the byte-order mirror of
    // m06: COMM (incl. the 80-bit extended sample rate) + SSND walk,
    // SIGNED 16-bit BIG-endian reassembly. The oracle pairs the same
    // keystream bytes big-endian (first byte is the high byte) — a
    // parser that confuses AIFF with WAV byte order fails instantly.
    QueryDef.of("m09_aiff_audio_stats",
      """WITH m AS (SELECT i AS media_id, CAST(100 + i * 10 AS BIGINT) AS n
        |  FROM range(10) t(i)),
        |by AS (SELECT media_id, n, j,
        |    ('0x' || substr(md5('aif:' || media_id || ':' || CAST(j // 16 AS BIGINT)),
        |                    CAST(2*(j % 16)+1 AS INT), 2))::INT AS b
        |  FROM m, range(400) t(j) WHERE j < n * 2),
        |s16 AS (SELECT media_id, n, j // 2 AS k,
        |    SUM(CASE WHEN j % 2 = 0 THEN 256 * b ELSE b END) AS u
        |  FROM by GROUP BY media_id, n, j // 2),
        |v AS (SELECT media_id, n,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
        |  FROM s16)
        |SELECT media_id, n AS n_samples,
        |  CAST(8000 + media_id * 100 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels, CAST(16 AS INT) AS bits_per_sample,
        |  CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs
        |FROM v GROUP BY media_id, n
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.pcmAudioStats(aiffMedia(s))
        .toDF()
        .orderBy("media_id")
    },

    // REAL SubRip transcript parse — the text half of the video
    // modality. Cue times leave the fixture as formatted
    // HH:MM:SS,mmm strings; the engine must parse them BACK to
    // milliseconds (the oracle derives the expected values from the
    // same id arithmetic, so a field-order, padding, or multi-line
    // join bug lands as a value mismatch). cue_idx is the file's own
    // 1-based index line — renumbering or dropping blocks is caught.
    QueryDef.of("m10_srt_cues",
      """WITH m AS (SELECT i AS media_id, CAST(2 + i % 4 AS INT) AS nc
        |  FROM range(12) t(i)),
        |c AS (SELECT media_id, k FROM m, range(5) t(k) WHERE k < nc),
        |t AS (SELECT media_id, CAST(k + 1 AS INT) AS cue_idx,
        |    media_id * 60000 + k * 3000 + (k * 37) % 1000 AS start_ms,
        |    media_id * 60000 + k * 3000 + (k * 37) % 1000
        |      + 2000 + (k * 53) % 500 AS end_ms,
        |    CASE WHEN k % 2 = 1
        |         THEN 'cue ' || media_id || ':' || k || chr(10) || 'line two ' || k
        |         ELSE 'cue ' || media_id || ':' || k END AS text
        |  FROM c)
        |SELECT media_id, cue_idx, CAST(start_ms AS BIGINT) AS start_ms,
        |  CAST(end_ms AS BIGINT) AS end_ms,
        |  CAST(length(text) AS BIGINT) AS n_chars, text
        |FROM t ORDER BY media_id, cue_idx""".stripMargin) { (s, dir) =>
      graft.multimodal.Subtitles.cues(srtMedia(s))
        .toDF()
        .select(col("media_id"), col("cue_idx"), col("start_ms"), col("end_ms"),
          length(col("text")).cast("long").as("n_chars"), col("text"))
        .orderBy("media_id", "cue_idx")
    },

    // Cross-modality alignment: REAL y4m frames (frame k at k·100 ms
    // for 10 fps) interval-joined to REAL parsed SRT cues
    // ([start_ms, end_ms) containment) — the transcript-to-frame
    // pairing a video-text training pipeline emits. Both sides come
    // from container parses (frame count from the y4m walk, times
    // parsed back from formatted strings); the oracle derives both
    // from the fixture arithmetic and replays the interval join, so
    // a fencepost on either boundary flips rows. Equi-join on
    // media_id with the range as residual — no cross product.
    QueryDef.of("m11_cue_frame_align",
      """WITH v AS (SELECT i AS media_id, CAST(2 + i % 3 AS INT) AS nf
        |  FROM range(12) t(i)),
        |fr AS (SELECT media_id, CAST(k AS INT) AS frame_idx,
        |    CAST(k * 100 AS BIGINT) AS frame_ms
        |  FROM v, range(4) t(k) WHERE k < nf),
        |sm AS (SELECT i AS media_id, CAST(2 + i % 4 AS INT) AS nc
        |  FROM range(12) t(i)),
        |cu AS (SELECT media_id, CAST(j + 1 AS INT) AS cue_idx,
        |    CAST(j * 150 AS BIGINT) AS start_ms,
        |    CAST(j * 150 + 200 AS BIGINT) AS end_ms
        |  FROM sm, range(5) t(j) WHERE j < nc)
        |SELECT fr.media_id, fr.frame_idx, fr.frame_ms, cu.cue_idx,
        |  cu.start_ms, cu.end_ms
        |FROM fr JOIN cu ON cu.media_id = fr.media_id
        |  AND fr.frame_ms >= cu.start_ms AND fr.frame_ms < cu.end_ms
        |ORDER BY fr.media_id, frame_idx, cue_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      val frames = Multimodal.sampleFrames(y4mMedia(s), everyN = 1)
        .map(f => (f.media_id, f.frame_idx, f.frame_idx * 100L))
        .toDF("media_id", "frame_idx", "frame_ms")
      val cues = graft.multimodal.Subtitles.cues(alignSrtMedia(s))
        .toDF()
        .select(col("media_id").as("c_media_id"), col("cue_idx"),
          col("start_ms"), col("end_ms"))
      frames.join(cues,
          col("media_id") === col("c_media_id") &&
            col("frame_ms") >= col("start_ms") && col("frame_ms") < col("end_ms"))
        .select("media_id", "frame_idx", "frame_ms", "cue_idx",
          "start_ms", "end_ms")
        .orderBy("media_id", "frame_idx", "cue_idx")
    },

    // M12: perceptual-hash image near-dup (ImageHash.dHash64 + banded
    // Hamming pairs) over originals + perturbed re-encodes. The oracle
    // replays the WHOLE pipeline from the keystream: perturbed pixels,
    // the integer nearest-neighbor 9×8 resample, the bitwise dHash
    // (packed as two 32-bit halves — SQL BIGINT can't construct bit
    // 63 by summed powers), and EXHAUSTIVE ≤3-Hamming pairs — so the
    // equality also certifies the band-join's pigeonhole recall
    // guarantee (banded engine ≡ all-pairs oracle at h ≤ 3).
    QueryDef.of("m12_image_neardup_dhash",
      """WITH m AS (SELECT i AS media_id, i AS src, 0 AS pert FROM range(24) t(i)
        |  UNION ALL SELECT 100 + i, i, 1 FROM range(24) t(i)),
        |d AS (SELECT media_id, src, pert, CAST(4 + src % 5 AS INT) AS w,
        |    CAST(3 + src % 4 AS INT) AS h FROM m),
        |px AS (SELECT media_id, w, h, j,
        |    LEAST(255, ('0x' || substr(md5('img:' || src || ':' || CAST(j // 16 AS BIGINT)),
        |                    CAST(2*(j % 16)+1 AS INT), 2))::INT
        |      + CASE WHEN pert = 1 AND j % 5 = 0 THEN 2 ELSE 0 END) AS v
        |  FROM d, range(48) t(j) WHERE j < w * h),
        |grid AS (SELECT d.media_id, yy.y, xx.x, p.v
        |  FROM d CROSS JOIN range(8) yy(y) CROSS JOIN range(9) xx(x)
        |  JOIN px p ON p.media_id = d.media_id
        |    AND p.j = (yy.y * d.h // 8) * d.w + (xx.x * d.w // 9)),
        |bits AS (SELECT l.media_id, l.y * 8 + l.x AS pos,
        |    CASE WHEN l.v < r.v THEN 1 ELSE 0 END AS bit
        |  FROM grid l JOIN grid r ON r.media_id = l.media_id
        |    AND r.y = l.y AND r.x = l.x + 1
        |  WHERE l.x < 8),
        |codes AS MATERIALIZED (SELECT media_id,
        |    CAST(SUM(CASE WHEN pos < 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(pos AS INT)) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(SUM(CASE WHEN pos >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(pos - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM bits GROUP BY media_id)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
        |FROM codes a JOIN codes b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val codes = graft.multimodal.ImageHash.frameHashes(
        Multimodal.sampleFrames(imageDupMedia(s), everyN = 1))
      graft.multimodal.ImageHash
        .nearDupPairs(codes, "media_id", "dhash", maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    // M13: VIDEO clip near-dup (ImageHash.clipNearDupPairs) — per-frame
    // dHash through the real y4m demux, banded frame-chunk candidates,
    // directional frame-containment verification: re-encoded copies
    // score 1.0 even when a frame was DROPPED (the copy→original
    // direction still matches every surviving frame). The oracle
    // replays keystream pixels, perturbation, the resample/bits/codes
    // chain per frame, and the EXHAUSTIVE min-Hamming containment —
    // equality again certifies the banded candidate join's recall.
    QueryDef.of("m13_video_neardup_frames",
      """WITH m AS (SELECT i AS media_id, i AS src, 0 AS pert FROM range(12) t(i)
        |  UNION ALL SELECT 100 + i, i, 1 FROM range(12) t(i)),
        |d AS (SELECT media_id, src, pert, CAST(5 + src % 3 AS INT) AS w,
        |    CAST(4 + src % 2 AS INT) AS h,
        |    CASE WHEN pert = 1 AND src % 3 = 0 THEN (2 + src % 3) - 1
        |         ELSE 2 + src % 3 END AS nf
        |  FROM m),
        |fr AS (SELECT media_id, src, pert, w, h, f FROM d, range(4) t(f) WHERE f < nf),
        |px AS (SELECT media_id, f, w, h, j,
        |    LEAST(255, ('0x' || substr(md5('y4m:' || src || ':' || f || ':' || CAST(j // 16 AS BIGINT)),
        |                    CAST(2*(j % 16)+1 AS INT), 2))::INT
        |      + CASE WHEN pert = 1 AND j % 5 = 0 THEN 2 ELSE 0 END) AS v
        |  FROM fr, range(35) t(j) WHERE j < w * h),
        |grid AS (SELECT p.media_id, p.f, yy.y, xx.x, p.v
        |  FROM (SELECT DISTINCT media_id, f, w, h FROM px) g
        |  CROSS JOIN range(8) yy(y) CROSS JOIN range(9) xx(x)
        |  JOIN px p ON p.media_id = g.media_id AND p.f = g.f
        |    AND p.j = (yy.y * g.h // 8) * g.w + (xx.x * g.w // 9)),
        |bits AS (SELECT l.media_id, l.f, l.y * 8 + l.x AS pos,
        |    CASE WHEN l.v < r.v THEN 1 ELSE 0 END AS bit
        |  FROM grid l JOIN grid r ON r.media_id = l.media_id AND r.f = l.f
        |    AND r.y = l.y AND r.x = l.x + 1
        |  WHERE l.x < 8),
        |codes AS MATERIALIZED (SELECT media_id, f,
        |    CAST(SUM(CASE WHEN pos < 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(pos AS INT)) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(SUM(CASE WHEN pos >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(pos - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM bits GROUP BY media_id, f),
        |ph AS MATERIALIZED (SELECT a.media_id AS ia, b.media_id AS ib, a.f AS fa, b.f AS fb,
        |    bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS ham
        |  FROM codes a JOIN codes b ON a.media_id < b.media_id),
        |ma AS (SELECT ia, ib,
        |    CAST(count(CASE WHEN mh <= 3 THEN 1 END) AS BIGINT) AS matched_a
        |  FROM (SELECT ia, ib, fa, MIN(ham) AS mh FROM ph GROUP BY 1, 2, 3)
        |  GROUP BY ia, ib),
        |mb AS (SELECT ia, ib,
        |    CAST(count(CASE WHEN mh <= 3 THEN 1 END) AS BIGINT) AS matched_b
        |  FROM (SELECT ia, ib, fb, MIN(ham) AS mh FROM ph GROUP BY 1, 2, 3)
        |  GROUP BY ia, ib),
        |nf AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n FROM codes GROUP BY media_id)
        |SELECT ia AS id_a, ib AS id_b, na.n AS n_a, nb.n AS n_b,
        |  matched_a, matched_b,
        |  round(greatest(matched_a / CAST(na.n AS DOUBLE),
        |    matched_b / CAST(nb.n AS DOUBLE)), 6) AS sim
        |FROM ma JOIN mb USING (ia, ib)
        |JOIN nf na ON na.media_id = ia JOIN nf nb ON nb.media_id = ib
        |WHERE greatest(matched_a / CAST(na.n AS DOUBLE),
        |  matched_b / CAST(nb.n AS DOUBLE)) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val codes = graft.multimodal.ImageHash.frameHashes(
        Multimodal.sampleFrames(y4mDupMedia(s), everyN = 1))
      graft.multimodal.ImageHash
        .clipNearDupPairs(codes, maxHamming = 3, minFrac = 0.5)
        .orderBy("id_a", "id_b")
    },

    // M14: AUDIO near-dup (AudioHash) — Haitsma-Kalker sub-fingerprints
    // in pure integer arithmetic: one 24-bit energy-difference code per
    // WINDOW POSITION over the whole clip (stride 1) through the REAL
    // RIFF/WAVE parse, 4×6-bit banded candidates, per-segment Hamming
    // verification, and the TWO-STAGE decision — ≥ minRun window
    // positions matching at ONE alignment delta, then full-overlap
    // bit-error-rate ≤ 6/24 at that delta (stage 1 alone is fooled by
    // chance near-matches smearing across overlapping windows; BER at
    // a consistent delta is the paper's decision). The fixture's 1-
    // and 3-sample head-trims are invisible to any block-aligned grid
    // but produce exact code runs at delta 1 / 3. The oracle replays
    // keystream bytes (at each family's byte offset), the +2
    // perturbation, signed 16-bit LE reassembly, the FULL dense window
    // grid, and EXHAUSTIVE all-alignments pairing — certifying both
    // the band join's per-segment recall and the delta grouping.
    QueryDef.of("m14_audio_neardup_energy",
      """WITH m AS (SELECT i AS media_id, i AS src, 0 AS pert, 0 AS boff FROM range(10) t(i)
        |  UNION ALL SELECT 100 + i, i, 1, 0 FROM range(10) t(i)
        |  UNION ALL SELECT 200 + i, i, 0, 2 FROM range(10) t(i)
        |  UNION ALL SELECT 300 + i, i, 0, 6 FROM range(10) t(i)),
        |d AS (SELECT media_id, src, pert, boff,
        |    CAST(120 + src * 10 - boff // 2 AS BIGINT) AS n FROM m),
        |by AS (SELECT media_id, n, j,
        |    LEAST(255, ('0x' || substr(md5('wav:' || src || ':' || CAST((j + boff) // 16 AS BIGINT)),
        |                    CAST(2*((j + boff) % 16)+1 AS INT), 2))::INT
        |      + CASE WHEN pert = 1 AND (j + boff) % 5 = 0 THEN 2 ELSE 0 END) AS b
        |  FROM d, range(420) t(j) WHERE j < 2 * n),
        |s16 AS (SELECT media_id, n, j // 2 AS k,
        |    SUM(CASE WHEN j % 2 = 0 THEN b ELSE 256 * b END) AS u
        |  FROM by GROUP BY media_id, n, j // 2),
        |v AS (SELECT media_id, n, k,
        |    ABS(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS a
        |  FROM s16),
        |e AS (SELECT media_id, o.off, (k - o.off) // 4 AS blk,
        |    CAST(SUM(a) AS BIGINT) AS energy
        |  FROM v JOIN range(111) o(off) ON o.off + 100 <= n
        |  WHERE k >= o.off AND k < o.off + 100
        |  GROUP BY media_id, o.off, (k - o.off) // 4),
        |bits AS (SELECT l.media_id, l.off, l.blk AS pos,
        |    CASE WHEN r.energy > l.energy THEN 1 ELSE 0 END AS bit
        |  FROM e l JOIN e r ON r.media_id = l.media_id AND r.off = l.off
        |    AND r.blk = l.blk + 1
        |  WHERE l.blk < 24),
        |codes AS MATERIALIZED (SELECT media_id, off,
        |    CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(pos AS INT))) AS BIGINT) AS code
        |  FROM bits GROUP BY media_id, off),
        |ph AS MATERIALIZED (SELECT a.media_id AS id_a, b.media_id AS id_b,
        |    a.off - b.off AS delta,
        |    bit_count(xor(a.code, b.code)) AS ham
        |  FROM codes a JOIN codes b ON a.media_id < b.media_id)
        |SELECT id_a, id_b, CAST(delta AS BIGINT) AS delta,
        |  CAST(SUM(CASE WHEN ham <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS matched,
        |  CAST(COUNT(*) AS BIGINT) AS overlap,
        |  CAST(SUM(ham) AS BIGINT) AS total_ham
        |FROM ph GROUP BY 1, 2, 3
        |HAVING SUM(CASE WHEN ham <= 3 THEN 1 ELSE 0 END) >= 5
        |  AND SUM(ham) <= 6 * COUNT(*)
        |ORDER BY id_a, id_b, delta""".stripMargin) { (s, dir) =>
      graft.multimodal.AudioHash
        .nearDupPairs(graft.multimodal.AudioHash.fingerprints(wavDupMedia(s)),
          maxHamming = 3, minRun = 5, maxAvgHam = 6)
        .orderBy("id_a", "id_b", "delta")
    },

    // M15: incremental image-ingest near-dup gate (ImageHash
    // .incrementalNearDup) — the daily-crawl form of m12: yesterday's
    // corpus is an append-only dHash table, today's batch (24
    // perturbed re-encodes + 12 genuinely novel images) probes it via
    // the banded chunk join; only the novels survive. The oracle
    // replays BOTH code sets from the keystream and the exhaustive
    // ≤3-Hamming history probe (codes as two 32-bit halves).
    QueryDef.of("m15_image_ingest_gate",
      """WITH m AS (
        |  SELECT i AS media_id, i AS src, 0 AS pert, 1 AS hist FROM range(24) t(i)
        |  UNION ALL SELECT 100 + i, i, 1, 0 FROM range(24) t(i)
        |  UNION ALL SELECT 200 + i, 50 + i, 0, 0 FROM range(12) t(i)),
        |d AS (SELECT media_id, src, pert, hist, CAST(4 + src % 5 AS INT) AS w,
        |    CAST(3 + src % 4 AS INT) AS h FROM m),
        |px AS (SELECT media_id, w, h, j,
        |    LEAST(255, ('0x' || substr(md5('img:' || src || ':' || CAST(j // 16 AS BIGINT)),
        |                    CAST(2*(j % 16)+1 AS INT), 2))::INT
        |      + CASE WHEN pert = 1 AND j % 5 = 0 THEN 2 ELSE 0 END) AS v
        |  FROM d, range(48) t(j) WHERE j < w * h),
        |grid AS (SELECT d.media_id, yy.y, xx.x, p.v
        |  FROM d CROSS JOIN range(8) yy(y) CROSS JOIN range(9) xx(x)
        |  JOIN px p ON p.media_id = d.media_id
        |    AND p.j = (yy.y * d.h // 8) * d.w + (xx.x * d.w // 9)),
        |bits AS (SELECT l.media_id, l.y * 8 + l.x AS pos,
        |    CASE WHEN l.v < r.v THEN 1 ELSE 0 END AS bit
        |  FROM grid l JOIN grid r ON r.media_id = l.media_id
        |    AND r.y = l.y AND r.x = l.x + 1
        |  WHERE l.x < 8),
        |codes AS MATERIALIZED (SELECT b.media_id, d.hist,
        |    CAST(SUM(CASE WHEN pos < 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(pos AS INT)) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(SUM(CASE WHEN pos >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(pos - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM bits b JOIN d ON d.media_id = b.media_id GROUP BY b.media_id, d.hist)
        |SELECT b.media_id, b.lo AS dhash_lo, b.hi AS dhash_hi
        |FROM codes b
        |WHERE b.hist = 0 AND NOT EXISTS (
        |  SELECT 1 FROM codes h WHERE h.hist = 1
        |    AND bit_count(xor(b.lo, h.lo)) + bit_count(xor(b.hi, h.hi)) <= 3)
        |ORDER BY b.media_id""".stripMargin) { (s, dir) =>
      val hist = graft.multimodal.ImageHash.frameHashes(
          Multimodal.sampleFrames(imageMedia(s), everyN = 1))
        .select("media_id", "dhash")
      val batch = graft.multimodal.ImageHash.frameHashes(
          Multimodal.sampleFrames(imageIngestMedia(s), everyN = 1))
        .select("media_id", "dhash")
      graft.multimodal.ImageHash.incrementalNearDup(batch, hist, maxHamming = 3)
        .select(col("media_id"),
          col("dhash").bitwiseAND(lit(0xffffffffL)).as("dhash_lo"),
          shiftright(col("dhash"), 32).bitwiseAND(lit(0xffffffffL)).as("dhash_hi"))
        .orderBy("media_id")
    },

    // M16: the PERSISTED media-code index lifecycle (MediaIndex — the
    // t65 idiom for perceptual codes): write the history corpus's
    // banded dHash table once, gate day-1's batch against the store,
    // UPSERT its survivors, then gate day-2's batch — which contains
    // perturbed copies of exactly what day 1 ACCEPTED — against the
    // GROWN index. A wrong upsert (or a stale manifest read) lets the
    // day-2 copies through and breaks the hash. The oracle replays
    // both stages from the keystream: codes for all four fixture sets,
    // day-1 gate vs history, day-2 gate vs history ∪ day-1 survivors.
    QueryDef.of("m16_media_index_gate",
      """WITH m AS (
        |  SELECT i AS media_id, i AS src, 0 AS pert, 'h' AS s FROM range(24) t(i)
        |  UNION ALL SELECT 100 + i, i, 1, 'a' FROM range(24) t(i)
        |  UNION ALL SELECT 200 + i, 50 + i, 0, 'a' FROM range(12) t(i)
        |  UNION ALL SELECT 300 + i, 50 + i, 1, 'b' FROM range(12) t(i)
        |  UNION ALL SELECT 400 + i, 80 + i, 0, 'b' FROM range(8) t(i)),
        |d AS (SELECT media_id, src, pert, s, CAST(4 + src % 5 AS INT) AS w,
        |    CAST(3 + src % 4 AS INT) AS h FROM m),
        |px AS (SELECT media_id, w, h, j,
        |    LEAST(255, ('0x' || substr(md5('img:' || src || ':' || CAST(j // 16 AS BIGINT)),
        |                    CAST(2*(j % 16)+1 AS INT), 2))::INT
        |      + CASE WHEN pert = 1 AND j % 5 = 0 THEN 2 ELSE 0 END) AS v
        |  FROM d, range(48) t(j) WHERE j < w * h),
        |grid AS (SELECT d.media_id, yy.y, xx.x, p.v
        |  FROM d CROSS JOIN range(8) yy(y) CROSS JOIN range(9) xx(x)
        |  JOIN px p ON p.media_id = d.media_id
        |    AND p.j = (yy.y * d.h // 8) * d.w + (xx.x * d.w // 9)),
        |bits AS (SELECT l.media_id, l.y * 8 + l.x AS pos,
        |    CASE WHEN l.v < r.v THEN 1 ELSE 0 END AS bit
        |  FROM grid l JOIN grid r ON r.media_id = l.media_id
        |    AND r.y = l.y AND r.x = l.x + 1
        |  WHERE l.x < 8),
        |codes AS MATERIALIZED (SELECT b.media_id, d.s,
        |    CAST(SUM(CASE WHEN pos < 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(pos AS INT)) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(SUM(CASE WHEN pos >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(pos - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM bits b JOIN d ON d.media_id = b.media_id GROUP BY b.media_id, d.s),
        |survA AS MATERIALIZED (SELECT media_id, lo, hi FROM codes b
        |  WHERE b.s = 'a' AND NOT EXISTS (
        |    SELECT 1 FROM codes h WHERE h.s = 'h'
        |      AND bit_count(xor(b.lo, h.lo)) + bit_count(xor(b.hi, h.hi)) <= 3)),
        |histB AS MATERIALIZED (SELECT lo, hi FROM codes WHERE s = 'h'
        |  UNION ALL SELECT lo, hi FROM survA),
        |survB AS (SELECT media_id FROM codes b
        |  WHERE b.s = 'b' AND NOT EXISTS (
        |    SELECT 1 FROM histB h
        |      WHERE bit_count(xor(b.lo, h.lo)) + bit_count(xor(b.hi, h.hi)) <= 3))
        |SELECT media_id, 'a' AS batch FROM survA
        |UNION ALL SELECT media_id, 'b' FROM survB
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      def codesOf(media: org.apache.spark.sql.Dataset[MediaRow]) =
        graft.multimodal.ImageHash.frameHashes(
            Multimodal.sampleFrames(media, everyN = 1))
          .select("media_id", "dhash")
      val path = "/tmp/graft_media_index_m16_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.multimodal.MediaIndex.write(path, codesOf(imageMedia(s)))
      val survA = graft.multimodal.MediaIndex.gate(
        s, path, codesOf(imageIngestMedia(s)), maxHamming = 3)
      graft.multimodal.MediaIndex.upsert(path, survA)
      val survB = graft.multimodal.MediaIndex.gate(
        s, path, codesOf(imageIngestMediaB(s)), maxHamming = 3)
      survA.select(col("media_id"), lit("a").as("batch"))
        .unionByName(survB.select(col("media_id"), lit("b").as("batch")))
        .orderBy("media_id")
    },

    // M17: the PERSISTED audio sub-fingerprint index lifecycle
    // (AudioHash.writeIndex/gate/upsertIndex over MediaIndex with the
    // 24-bit code's own 4×6-bit banding — the m16 idiom for narrow
    // codes): index the history clips on the SPARSE stored grid (one
    // window per BlockSamples — 1/4 the store, full shift recall
    // because the probe stays dense), gate day 1 (perturbed copies +
    // novels) with the TWO-STAGE matcher (≥ 5 STORED window positions
    // within Hamming 3 at one delta, then stored-overlap BER ≤ 6/24
    // at that delta), upsert the survivors (thinned to the same
    // grid), then gate day 2 — whose copies are HEAD-TRIMMED
    // (2 samples) versions of exactly what day 1 accepted, so they
    // only drop via a delta −2 run against the grown index; a wrong
    // upsert, stale manifest, banding mismatch, or wrong stored
    // stride lets them through (or drops a novel) and breaks the
    // hash. The oracle replays all four fixture sets' code grids —
    // dense on the probe side, `off % 4 = 0` on the stored side —
    // and both gates exhaustively.
    QueryDef.of("m17_audio_index_gate",
      """WITH m AS (
        |  SELECT i AS media_id, CAST(i AS VARCHAR) AS sk, 0 AS pert, 0 AS boff,
        |      CAST(120 + i * 10 AS BIGINT) AS n, 'h' AS s FROM range(10) t(i)
        |  UNION ALL SELECT 100 + i, CAST(i AS VARCHAR), 1, 0,
        |      CAST(120 + i * 10 AS BIGINT), 'a' FROM range(10) t(i)
        |  UNION ALL SELECT 200 + i, CAST(50 + i AS VARCHAR), 0, 0,
        |      CAST(120 + i * 10 AS BIGINT), 'a' FROM range(6) t(i)
        |  UNION ALL SELECT 300 + i, CAST(50 + i AS VARCHAR), 0, 4,
        |      CAST(118 + i * 10 AS BIGINT), 'b' FROM range(6) t(i)
        |  UNION ALL SELECT 400 + j, CAST(80 + j AS VARCHAR), 0, 0,
        |      CAST(120 + j * 10 AS BIGINT), 'b' FROM range(4) t(j)),
        |by AS (SELECT media_id, s, n, j,
        |    LEAST(255, ('0x' || substr(md5('wav:' || sk || ':' || CAST((j + boff) // 16 AS BIGINT)),
        |                    CAST(2*((j + boff) % 16)+1 AS INT), 2))::INT
        |      + CASE WHEN pert = 1 AND (j + boff) % 5 = 0 THEN 2 ELSE 0 END) AS b
        |  FROM m, range(420) t(j) WHERE j < 2 * n),
        |s16 AS (SELECT media_id, s, n, j // 2 AS k,
        |    SUM(CASE WHEN j % 2 = 0 THEN b ELSE 256 * b END) AS u
        |  FROM by GROUP BY media_id, s, n, j // 2),
        |v AS (SELECT media_id, s, n, k,
        |    ABS(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS a
        |  FROM s16),
        |e AS (SELECT media_id, s, o.off, (k - o.off) // 4 AS blk,
        |    CAST(SUM(a) AS BIGINT) AS energy
        |  FROM v JOIN range(111) o(off) ON o.off + 100 <= n
        |  WHERE k >= o.off AND k < o.off + 100
        |  GROUP BY media_id, s, o.off, (k - o.off) // 4),
        |bits AS (SELECT l.media_id, l.s, l.off, l.blk AS pos,
        |    CASE WHEN r.energy > l.energy THEN 1 ELSE 0 END AS bit
        |  FROM e l JOIN e r ON r.media_id = l.media_id AND r.off = l.off
        |    AND r.blk = l.blk + 1
        |  WHERE l.blk < 24),
        |codes AS MATERIALIZED (SELECT media_id, s, off,
        |    CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(pos AS INT))) AS BIGINT) AS code
        |  FROM bits GROUP BY media_id, s, off),
        |runA AS MATERIALIZED (SELECT b.media_id AS bid, h.media_id AS hid,
        |    b.off - h.off AS delta,
        |    SUM(CASE WHEN bit_count(xor(b.code, h.code)) <= 3 THEN 1 ELSE 0 END) AS c,
        |    COUNT(*) AS o, SUM(bit_count(xor(b.code, h.code))) AS th
        |  FROM codes b JOIN codes h ON b.s = 'a' AND h.s = 'h' AND h.off % 4 = 0
        |  GROUP BY 1, 2, 3),
        |survA AS MATERIALIZED (SELECT media_id FROM codes WHERE s = 'a'
        |  AND media_id NOT IN (SELECT bid FROM runA WHERE c >= 5 AND th <= 6 * o)
        |  GROUP BY media_id),
        |histB AS MATERIALIZED (
        |  SELECT media_id, off, code FROM codes WHERE s = 'h' AND off % 4 = 0
        |  UNION ALL SELECT c.media_id, c.off, c.code
        |  FROM codes c JOIN survA v ON c.media_id = v.media_id AND c.s = 'a'
        |    AND c.off % 4 = 0),
        |runB AS MATERIALIZED (SELECT b.media_id AS bid, h.media_id AS hid,
        |    b.off - h.off AS delta,
        |    SUM(CASE WHEN bit_count(xor(b.code, h.code)) <= 3 THEN 1 ELSE 0 END) AS c,
        |    COUNT(*) AS o, SUM(bit_count(xor(b.code, h.code))) AS th
        |  FROM codes b JOIN histB h ON b.s = 'b'
        |  GROUP BY 1, 2, 3),
        |survB AS (SELECT media_id FROM codes WHERE s = 'b'
        |  AND media_id NOT IN (SELECT bid FROM runB WHERE c >= 5 AND th <= 6 * o)
        |  GROUP BY media_id)
        |SELECT media_id, 'a' AS batch FROM survA
        |UNION ALL SELECT media_id, 'b' FROM survB
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.AudioHash
      val path = "/tmp/graft_audio_index_m17_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      AudioHash.writeIndex(path, AudioHash.fingerprints(wavHistMedia(s)))
      val survA = AudioHash.gate(
        s, path, AudioHash.fingerprints(wavIngestMedia(s)), maxHamming = 3, minRun = 5)
      AudioHash.upsertIndex(path, survA)
      val survB = AudioHash.gate(
        s, path, AudioHash.fingerprints(wavIngestMediaB(s)), maxHamming = 3, minRun = 5)
      survA.select(col("media_id"), lit("a").as("batch")).distinct()
        .unionByName(survB.select(col("media_id"), lit("b").as("batch")).distinct())
        .orderBy("media_id")
    })
}
