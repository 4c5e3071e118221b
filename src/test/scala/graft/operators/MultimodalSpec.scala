package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Multimodal binary-column plumbing: real PNG header parse, the
  * deterministic decode stub, resize arithmetic, and codegen-native
  * frame sampling. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  /** Minimal PNG: signature + IHDR (no pixel payload — header
    * parsing must not need one). */
  private def png(w: Int, h: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(33)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    buf.putInt(13).put("IHDR".getBytes("US-ASCII"))
    buf.putInt(w).putInt(h).put(8.toByte).put(0.toByte) // bit depth 8, grayscale
    buf.put(0.toByte).put(0.toByte).put(0.toByte)       // compression/filter/interlace
    buf.array()
  }

  test("PNG header parse without pixel data") {
    val df = Seq((1L, png(640, 480)), (2L, "not a png".getBytes.asInstanceOf[Array[Byte]]))
      .toDF("img_id", "content")
    val got = df.select(col("img_id"), Multimodal.imageInfo(col("content")).as("i"))
      .select(col("img_id"), col("i.width"), col("i.height"), col("i.bitDepth"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(got == Set((1L, 640, 480, 8), (2L, -1, -1, -1)))
  }

  test("decode stub produces the declared shape; resize arithmetic is real") {
    val df = Seq((1L, png(8, 4))).toDF("img_id", "content")
      .withColumn("info", Multimodal.imageInfo(col("content")))
      .withColumn("pixels", Multimodal.decodeStub(col("content"), col("info")))
    val px = df.select("pixels").as[Seq[Int]].head()
    assert(px.length == 32)
    assert(px.forall(p => p >= 0 && p < 256))
    val small = df.select(
      Multimodal.resize(col("pixels"), col("info.width"), col("info.height"), 4, 2).as("r"))
      .as[Seq[Int]].head()
    assert(small.length == 8)
    // nearest-neighbor: output (0,0) samples input (0,0)
    assert(small.head == px.head)
  }

  test("frame sampling slices binary video without decoding") {
    // 10 "frames" of 4 bytes each: frame i is [i,i,i,i]
    val video = Array.tabulate(40)(i => (i / 4).toByte)
    val df = Seq((7L, video)).toDF("video_id", "data")
    val frames = Multimodal.sampleFrames(df, "data", frameBytes = 4, everyK = 3, idCol = "video_id")
      .select(col("video_id"), col("frame_idx"), col("frame"))
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSeq.sortBy(_._1)
    assert(frames.map(_._1) == Seq(0, 3, 6, 9))
    assert(frames.forall { case (i, bytes) => bytes == Seq.fill(4)(i.toByte) })
  }
}
