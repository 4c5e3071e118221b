package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class VideoSpec extends SparkSuite {
  import spark.implicits._

  /** A 60-bit pattern as a 9×8 gray PNG whose dHash IS the pattern
    * (the q95/q101 fixture walk). */
  private def patternPng(pat: Long): Array[Byte] = {
    val px = new Array[Int](9 * 8)
    for (y <- 0 until 8) {
      px(y * 9) = 128
      for (x <- 0 until 8) {
        val bit = (pat >>> (y * 8 + x)) & 1L
        px(y * 9 + x + 1) = px(y * 9 + x) + (if (bit == 1L) -7 else 7)
      }
    }
    Multimodal.encodePngGray(px, 9, 8)
  }

  test("AVI/MPNG round-trip: header fields and frame payloads byte-exact") {
    val frames = Array.tabulate(5)(f => patternPng(0x0123456789ABCL ^ f))
    val avi = Video.encodeAviMpng(frames, 9, 8, usPerFrame = 33333)
    val info = Video.aviInfo(avi)
    assert(info == Video.AviInfo(9, 8, 33333, 5, "MPNG"))
    val back = Video.decodeAviFrames(avi)
    assert(back.length == 5)
    for (f <- 0 until 5)
      assert(back(f).toSeq == frames(f).toSeq, s"frame $f payload drifted")
    // Every extracted payload is itself a decodable PNG.
    assert(back.forall(Multimodal.decodePng(_) != null))
  }

  test("odd-length frame payloads survive the RIFF even-padding rules") {
    // PNG sizes vary with content; force both parities explicitly.
    val oddFrame = patternPng(1L)
    val sized =
      if (oddFrame.length % 2 == 1) Array(oddFrame, oddFrame ++ Array(0x00.toByte))
      else Array(oddFrame ++ Array(0x00.toByte), oddFrame)
    assert(sized(0).length % 2 == 1 && sized(1).length % 2 == 0)
    val back = Video.decodeAviFrames(Video.encodeAviMpng(sized, 9, 8))
    assert(back.length == 2)
    assert(back(0).toSeq == sized(0).toSeq && back(1).toSeq == sized(1).toSeq)
  }

  test("non-AVI, truncated, and corrupt-length containers return null, never garbage") {
    assert(Video.aviInfo(null) == null)
    assert(Video.aviInfo(Array[Byte](1, 2, 3)) == null)
    assert(Video.decodeAviFrames("RIFFxxxxWAVE".getBytes) == null)
    val good = Video.encodeAviMpng(Array(patternPng(7L)), 9, 8)
    assert(Video.decodeAviFrames(good).length == 1)
    // Truncation mid-movi: the chunk walk stops at the corrupt size
    // instead of reading past the buffer.
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length - 20)
    val frames = Video.decodeAviFrames(cut)
    assert(frames == null || frames.length <= 1)
    // A corrupt chunk length near Int.MaxValue must not wrap.
    val evil = good.clone()
    evil(4) = 0xff.toByte; evil(5) = 0xff.toByte
    evil(6) = 0xff.toByte; evil(7) = 0x7f.toByte
    Video.aviInfo(evil) // must not throw
  }

  test("frames() explodes every k-th container frame with container indexes") {
    val pats = Array.tabulate(7)(f => 0x1111L * (f + 1))
    val avi = Video.encodeAviMpng(pats.map(patternPng), 9, 8)
    val df = Seq((3L, avi), (4L, "DEADBEEF".getBytes)).toDF("video_id", "video")
    val out = Video.frames(df, everyK = 3)
      .select(col("video_id"), col("frame_idx"), col("frame"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    // Undecodable video 4 contributes no rows; video 3 samples 0,3,6.
    assert(out.map(t => (t._1, t._2)).sorted.toSeq == Seq((3L, 0), (3L, 3), (3L, 6)))
    for ((_, idx, frame) <- out)
      assert(frame.toSeq == patternPng(pats(idx)).toSeq)
  }

  test("frame dHash equals the synthesized pattern; near-dup pairs match the analytic design") {
    // Two clusters of 3 videos, 2 frames each — the q101 design in
    // miniature: member m flips bit m*13 in every frame.
    val rows = for {
      c <- 0 until 2
      m <- 0 until 3
    } yield {
      val frames = Array.tabulate(2) { f =>
        var pat = graft.functions.HashOps.h60(s"v:$c:$f".getBytes)
        if (m > 0) pat ^= 1L << (m * 13)
        patternPng(pat)
      }
      ((c * 3 + m).toLong, Video.encodeAviMpng(frames, 9, 8))
    }
    val df = rows.toDF("video_id", "video")
    // dHash of frame f of the base video IS the pattern.
    val hashes = Video.frameDHashes(df)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(hashes((0L, 0)) == graft.functions.HashOps.h60("v:0:0".getBytes))
    assert(hashes((0L, 1)) == graft.functions.HashOps.h60("v:0:1".getBytes))
    val pairs = Video.videoNearDupPairs(df, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getInt(3))).toMap
    val expected = Map(
      (0L, 1L) -> (2L, 1), (0L, 2L) -> (2L, 1), (1L, 2L) -> (2L, 2),
      (3L, 4L) -> (2L, 1), (3L, 5L) -> (2L, 1), (4L, 5L) -> (2L, 2))
    assert(pairs == expected, s"got $pairs")
  }
}
