package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schemas, frame sampling, resize, features,
  * byte-balanced partitioning — all over the deterministic stub codec. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 30).cache()

  test("synthetic media is deterministic and schema-typed") {
    val a = media.filter(_.media_id == 5).collect().head
    val b = Multimodal.syntheticMedia(spark, 30).filter(_.media_id == 5).collect().head
    assert(a.content.toSeq === b.content.toSeq)
    assert(a.content.length === a.width * a.height * a.n_frames)
  }

  test("sampleFrames explodes every Nth frame with correct shapes") {
    val frames = Multimodal.sampleFrames(media, everyN = 2).collect()
    val videos = media.filter(_.kind == "video").count()
    val images = media.filter(_.kind == "image").count()
    // videos have 4 frames → idx 0,2 kept; images 1 frame → idx 0
    assert(frames.length === videos * 2 + images)
    assert(frames.forall(f => f.pixels.length === f.width * f.height))
  }

  test("resize keeps ids and produces the requested shape") {
    val frames = Multimodal.sampleFrames(media, 4)
    val small = Multimodal.resized(frames, 4, 4).collect()
    assert(small.forall(f => f.width === 4 && f.height === 4 && f.pixels.length === 16))
    // deterministic: resizing twice gives identical bytes
    val again = Multimodal.resized(frames, 4, 4).collect()
    assert(small.map(_.pixels.toSeq).toSet === again.map(_.pixels.toSeq).toSet)
  }

  test("extractFeatures: histogram embedding sums to 1, stats sane") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 30)
    feats.foreach { f =>
      assert(math.abs(f.embedding.map(_.toDouble).sum - 1.0) < 1e-6)
      assert(f.mean_px >= 0 && f.mean_px <= 255)
      assert(f.embedding.length === 16)
    }
  }

  test("balanceByBytes partitions by payload budget") {
    val df = media.toDF().withColumn("content_size", length(col("content")).cast("long"))
    val total = df.select(sum("content_size")).as[Long].collect().head
    val parts = Multimodal.balanceByBytes(df, targetPartitionBytes = total / 4)
      .rdd.getNumPartitions
    assert(parts === 4)
  }

  test("REAL codec: PNG payloads decode through the same mapPartitions path") {
    // encode real PNGs (javax.imageio) whose pixels we control, mark
    // them format=image/png, and run the SAME sampleFrames/
    // extractFeatures plans the stub uses
    val pngMedia = spark.createDataset((0 until 6).map { i =>
      val w = 10 + i; val h = 7 + i
      val px = Array.tabulate(w * h)(j => ((i * 31 + j * 7) % 256).toByte)
      // width/height metadata DELIBERATELY wrong (0): the real codec
      // reads dims from the payload, proving the decode is genuine
      MediaRow(100L + i, "image", Multimodal.ImageIoCodec.encodePng(w, h, px), 0, 0, 1, "image/png")
    })

    val frames = Multimodal.sampleFrames(pngMedia, everyN = 1).collect()
    assert(frames.length === 6)
    frames.foreach { f =>
      val i = (f.media_id - 100).toInt
      assert(f.width === 10 + i && f.height === 7 + i)
      // gray PNG round-trips luma exactly: (v*299+v*587+v*114)/1000 = v
      val expected = Array.tabulate(f.width * f.height)(j => ((i * 31 + j * 7) % 256).toByte)
      assert(f.pixels.toSeq === expected.toSeq)
    }

    // features flow through the same batch pass; resize works on real pixels
    val feats = Multimodal.extractFeatures(pngMedia).collect()
    assert(feats.length === 6 && feats.forall(_.embedding.length === 16))
    val small = Multimodal.resized(Multimodal.sampleFrames(pngMedia, 1), 4, 4).collect()
    assert(small.forall(f => f.pixels.length === 16))
  }

  test("palette-indexed (GIF) and 16-bit gray payloads decode to real luma") {
    // a 4×4 GIF whose palette maps index 0 → white, index 1 → red:
    // the raw 1-band raster samples are palette INDICES (0/1); correct
    // decode must go through the palette, not read indices as luma
    val cmap = Array(0xffffff, 0xff0000) // white, red
    val icm = new java.awt.image.IndexColorModel(8, 2, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 4; x <- 0 until 4)
      img.getRaster.setSample(x, y, 0, if (y < 2) 0 else 1)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val (w, h, px) = Multimodal.ImageIoCodec.decodeImage(bos.toByteArray)
    assert(w === 4 && h === 4)
    // ground truth: the re-read image's own getRGB lumas (the GIF
    // writer may reorder tiny low-bit images, so don't assume the
    // written layout — only that decode goes through the palette)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    val expected = for (y <- 0 until 4; x <- 0 until 4) yield {
      val rgb = back.getRGB(x, y)
      (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
    }
    assert(px.map(_ & 0xff).toSeq === expected)
    // and it is genuine luma, not raw palette indices (0/1)
    assert(px.map(_ & 0xff).toSet === Set(255, (255 * 299) / 1000))

    // 16-bit gray PNG: samples scale 16→8 bits instead of truncating
    val img16 = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    img16.getRaster.setSample(0, 0, 0, 0xffff) // white
    img16.getRaster.setSample(1, 0, 0, 0x8000) // mid-gray
    val bos16 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img16, "png", bos16)
    val (w16, _, px16) = Multimodal.ImageIoCodec.decodeImage(bos16.toByteArray)
    assert(w16 === 2)
    assert((px16(0) & 0xff) === 255) // toByte truncation would give 255→but 0xffff.toByte = -1 ok; 0x8000.toByte = 0
    assert((px16(1) & 0xff) === 0x80)
  }

  test("REAL multi-frame container: animated GIF round-trips every frame exactly") {
    val (w, h) = (9, 7)
    val frames = (0 until 4).map(f =>
      Multimodal.FakeCodec.encode(s"gifframe:$f", w, h, 1))
    val gif = Multimodal.ImageIoCodec.encodeGif(w, h, frames)
    // direct codec round-trip: every frame, bit-exact
    val decoded = Multimodal.ImageIoCodec.decodeAllFrames(gif)
    assert(decoded.length === 4)
    decoded.zip(frames).foreach { case ((dw, dh, px), expect) =>
      assert((dw, dh) === ((w, h)))
      assert(px.toSeq === expect.toSeq)
    }
    // through the production mapPartitions path: one DecodedFrame per
    // container frame, indexed in order
    val ds = spark.createDataset(Seq(
      MediaRow(77L, "video", gif, 0, 0, 4, "image/gif")))
    val out = Multimodal.sampleFrames(ds, everyN = 1).collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq === Seq(0, 1, 2, 3))
    assert(out.forall(f => f.width == w && f.height == h))
    assert(out(2).pixels.toSeq === frames(2).toSeq)
  }

  test("mixed stub + real formats in one dataset decode per-row") {
    val px = Array.tabulate(64)(j => (j * 3).toByte)
    val mixed = spark.createDataset(Seq(
      MediaRow(1L, "image", Multimodal.ImageIoCodec.encodePng(8, 8, px), 0, 0, 1, "image/png"),
      MediaRow(2L, "image", Multimodal.FakeCodec.encode("m2", 8, 8, 1), 8, 8, 1, "fake/v1")))
    val frames = Multimodal.sampleFrames(mixed, 1).collect().sortBy(_.media_id)
    assert(frames.length === 2)
    assert(frames(0).pixels.toSeq === px.toSeq)
    assert(frames(1).pixels.toSeq ===
      Multimodal.FakeCodec.decode(Multimodal.FakeCodec.encode("m2", 8, 8, 1), 8, 8, 1).head.toSeq)
  }
}
