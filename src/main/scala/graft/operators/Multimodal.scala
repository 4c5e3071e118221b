package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/video assets as opaque binary
  * columns with typed metadata, following the same pattern as the
  * audio family — header-only metadata extraction stays cheap and
  * prunable, full decode is a clearly-marked stand-in behind a
  * stable operator surface (the container ships no image/video
  * libraries; a real deployment swaps the kernel, not the plan),
  * and per-row transforms batch through executor-side functions.
  */
object Multimodal {

  final case class PngInfo(width: Int, height: Int, bitDepth: Int, colorType: Int)

  /** REAL header parse: PNG signature + IHDR chunk (width, height,
    * bit depth, color type) — no image library needed, and metadata
    * queries never touch pixel data. Returns null for non-PNG bytes. */
  def pngInfo(bytes: Array[Byte]): PngInfo = {
    if (bytes == null || bytes.length < 33) return null
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    var i = 0
    while (i < 8) { if (bytes(i) != sig(i)) return null; i += 1 }
    // first chunk must be IHDR: length(4) type(4) data(13)
    if (!(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')) return null
    def be32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    PngInfo(be32(16), be32(20), bytes(24) & 0xff, bytes(25) & 0xff)
  }

  private val pngInfoUdf = udf((b: Array[Byte]) => Option(pngInfo(b)))

  /** Header-only image metadata column. */
  def imageInfo(bin: Column): Column = pngInfoUdf(bin)

  /** STUB pixel decode — deterministic fake: pixel (x, y) of an
    * image with content hash h is `(h + x*31 + y*17) mod 256`,
    * flattened row-major. The schema/batch shape downstream
    * operators see is the real one (array<int> of w*h grayscale);
    * only the pixel values are fake. Marked stand-in: a real
    * deployment replaces this kernel with an actual decoder. */
  def decodeStub(bin: Column, info: Column): Column = {
    val f = udf((b: Array[Byte], w: Int, h: Int) => {
      if (b == null || w <= 0 || h <= 0) null
      else {
        val hash = java.util.Arrays.hashCode(b) & 0x7fffffff
        Array.tabulate(math.min(w * h, 1 << 20))(i =>
          (hash + (i % w) * 31 + (i / w) * 17) % 256)
      }
    })
    f(bin, info.getField("width"), info.getField("height"))
  }

  /** Nearest-neighbor resize over a row-major pixel array — real
    * arithmetic over whatever the decode produced. */
  def resize(pixels: Column, w: Column, h: Column, outW: Int, outH: Int): Column = {
    val f = udf((px: Seq[Int], w: Int, h: Int) => {
      if (px == null || w <= 0 || h <= 0) null
      else Array.tabulate(outW * outH) { i =>
        val x = (i % outW) * w / outW
        val y = (i / outW) * h / outH
        px(math.min(px.length - 1, y * w + x))
      }
    })
    f(pixels, w, h)
  }

  /** Frame sampling for fixed-frame-size binary "video": every k-th
    * frame as its own row — pure slice arithmetic on the binary
    * column (substring on binary stays in codegen), no decode. */
  def sampleFrames(video: DataFrame, binCol: String, frameBytes: Int, everyK: Int,
                   idCol: String = "video_id"): DataFrame = {
    val nFrames = (length(col(binCol)) / frameBytes).cast("int")
    video
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyK))))
      .select(
        col(idCol), col("frame_idx"),
        col(binCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }
}
