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
}
