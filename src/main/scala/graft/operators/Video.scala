package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL video container tier, java.base only — the last modality off
  * a stand-in (r9 sliced fixed-size byte frames without decoding;
  * cf. reference crawler's audio-only pipeline, `crawler/base.py` —
  * video is north-star surface, not a reference port).
  *
  * Container = RIFF AVI with the Motion-PNG codec (fourcc `MPNG`):
  * every `00dc` frame chunk carries a complete PNG, which the
  * existing [[Multimodal.decodePng]] / [[Multimodal.dHashPng]]
  * machinery decodes and perceptually hashes — the same layering as
  * the audio tier (real WAV container parse over real PCM frames).
  * The parser is a proper chunk walk (sizes + even-padding per the
  * RIFF spec), not a byte scan, so truncated or corrupt containers
  * return null instead of garbage frames.
  *
  * Scale shape: one row holds one video's bytes (the lake-asset
  * boundary, as for PDF/WAV); frame explode is generate-only and
  * per-row bounded ([[MaxFramesPerVideo]]), frame hashing is one
  * kernel call per frame, and cross-video near-dup rides the
  * signature-generic banded hamming join ([[Dedup
  * .hammingNearDupPairs]]) — never an all-pairs of frames.
  */
object Video {

  /** Header metadata: stream dimensions, timing, frame count, and
    * the video stream's codec fourcc. */
  final case class AviInfo(width: Int, height: Int, usPerFrame: Int,
                           totalFrames: Int, fourcc: String)

  /** Per-row frame-count bound: a corrupt header cannot make one row
    * explode into unbounded frames — the per-row-state discipline of
    * the audio/image kernels. */
  val MaxFramesPerVideo: Int = 4096

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourccAt(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "US-ASCII")

  /** Minimal AVI/MPNG ENCODER: RIFF(AVI ) → LIST hdrl (avih, LIST
    * strl (strh vids/MPNG, strf BITMAPINFOHEADER)) → LIST movi
    * (`00dc` chunk per PNG frame, even-padded) → idx1. Real,
    * spec-shaped structure — the fixture generator for the video
    * gate (q101 synthesizes cluster corpora through it) and the
    * sink-side complement of the parser (round-trip spec-pinned). */
  def encodeAviMpng(frames: Array[Array[Byte]], w: Int, h: Int,
                    usPerFrame: Int = 40000): Array[Byte] = {
    require(frames != null && frames.nonEmpty && frames.forall(f => f != null && f.nonEmpty),
      "no frames")
    require(frames.length <= MaxFramesPerVideo, s"more than $MaxFramesPerVideo frames")
    require(w > 0 && h > 0 && usPerFrame > 0, "bad dimensions/timing")
    val out = new java.io.ByteArrayOutputStream()
    def le32b(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
        ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    def le16b(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      cc(tpe) ++ le32b(data.length) ++ data ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      cc("LIST") ++ le32b(body.length + 4) ++ cc(listType) ++ body

    val maxFrame = frames.map(_.length).max
    // strh: fccType/handler, flags, prio+lang, initialFrames,
    // scale/rate (fps = rate/scale), start, length, bufSize, quality,
    // sampleSize, rcFrame.
    val strh = cc("vids") ++ cc("MPNG") ++ le32b(0) ++ le16b(0) ++ le16b(0) ++
      le32b(0) ++ le32b(usPerFrame) ++ le32b(1000000) ++ le32b(0) ++
      le32b(frames.length) ++ le32b(maxFrame) ++ le32b(-1) ++ le32b(0) ++
      le16b(0) ++ le16b(0) ++ le16b(w) ++ le16b(h)
    // strf: BITMAPINFOHEADER with biCompression = 'MPNG'.
    val strf = le32b(40) ++ le32b(w) ++ le32b(h) ++ le16b(1) ++ le16b(24) ++
      cc("MPNG") ++ le32b(w * h * 3) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++ le32b(0)
    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val avih = le32b(usPerFrame) ++ le32b(0) ++ le32b(0) ++ le32b(0x10) ++
      le32b(frames.length) ++ le32b(0) ++ le32b(1) ++ le32b(maxFrame) ++
      le32b(w) ++ le32b(h) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++ le32b(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)

    val moviBody = new java.io.ByteArrayOutputStream()
    val offsets = new Array[Int](frames.length)
    var i = 0
    while (i < frames.length) {
      offsets(i) = moviBody.size() + 4 // from the 'movi' fourcc
      moviBody.write(chunk("00dc", frames(i)))
      i += 1
    }
    val movi = list("movi", moviBody.toByteArray)
    val idxBody = new java.io.ByteArrayOutputStream()
    i = 0
    while (i < frames.length) {
      idxBody.write(cc("00dc")); idxBody.write(le32b(0x10)) // AVIIF_KEYFRAME
      idxBody.write(le32b(offsets(i))); idxBody.write(le32b(frames(i).length))
      i += 1
    }
    val idx1 = chunk("idx1", idxBody.toByteArray)
    val riffBody = cc("AVI ") ++ hdrl ++ movi ++ idx1
    out.write(cc("RIFF")); out.write(le32b(riffBody.length)); out.write(riffBody)
    out.toByteArray
  }

  /** Iterate the chunks of a RIFF region `[off, end)`, calling `f`
    * with (fourcc, dataOff, dataLen); descends are the caller's
    * choice. Stops on a malformed size instead of reading garbage. */
  private def walkChunks(bytes: Array[Byte], off0: Int, end: Int)
                        (f: (String, Int, Int) => Boolean): Unit = {
    var off = off0
    var go = true
    while (go && off + 8 <= end) {
      val len = le32(bytes, off + 4)
      // Long compare: a corrupt length near Int.MaxValue would wrap.
      if (len < 0 || off.toLong + 8 + len > end) go = false
      else {
        go = f(fourccAt(bytes, off), off + 8, len)
        off += 8 + len + (len % 2) // chunks are even-padded
      }
    }
  }

  /** REAL header parse: RIFF signature, LIST hdrl walk, `avih`
    * fixed fields + the first video stream's `strh` fourcc. Null for
    * anything that is not a well-formed AVI. */
  def aviInfo(bytes: Array[Byte]): AviInfo = {
    if (bytes == null || bytes.length < 24) return null
    if (fourccAt(bytes, 0) != "RIFF" || fourccAt(bytes, 8) != "AVI ") return null
    val end = math.min(bytes.length.toLong, 8L + le32(bytes, 4)).toInt
    var usPerFrame = -1
    var totalFrames = -1
    var w = -1
    var h = -1
    var fourcc: String = null
    walkChunks(bytes, 12, end) { (tpe, dOff, dLen) =>
      if (tpe == "LIST" && dLen >= 4 && fourccAt(bytes, dOff) == "hdrl") {
        walkChunks(bytes, dOff + 4, dOff + dLen) { (t2, d2, l2) =>
          if (t2 == "avih" && l2 >= 40) {
            usPerFrame = le32(bytes, d2)
            totalFrames = le32(bytes, d2 + 16)
            w = le32(bytes, d2 + 32)
            h = le32(bytes, d2 + 36)
          } else if (t2 == "LIST" && l2 >= 4 && fourccAt(bytes, d2) == "strl") {
            walkChunks(bytes, d2 + 4, d2 + l2) { (t3, d3, l3) =>
              if (t3 == "strh" && l3 >= 8 && fourccAt(bytes, d3) == "vids" && fourcc == null)
                fourcc = fourccAt(bytes, d3 + 4)
              true
            }
          }
          true
        }
        false // hdrl found — stop the top-level walk
      } else true
    }
    if (usPerFrame < 0 || w <= 0 || h <= 0 || fourcc == null) null
    else AviInfo(w, h, usPerFrame, totalFrames, fourcc)
  }

  /** REAL frame extraction: walk LIST movi, collect each `00dc`/
    * `00db` payload (stream-0 compressed/uncompressed frame chunks)
    * in stream order, bounded by [[MaxFramesPerVideo]]. Null for
    * non-AVI bytes; an AVI with zero frame chunks yields an empty
    * array. With the MPNG codec each payload is a complete PNG. */
  def decodeAviFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
    if (aviInfo(bytes) == null) return null
    val end = math.min(bytes.length.toLong, 8L + le32(bytes, 4)).toInt
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    walkChunks(bytes, 12, end) { (tpe, dOff, dLen) =>
      if (tpe == "LIST" && dLen >= 4 && fourccAt(bytes, dOff) == "movi") {
        walkChunks(bytes, dOff + 4, dOff + dLen) { (t2, d2, l2) =>
          if (t2 == "00dc" || t2 == "00db")
            frames += java.util.Arrays.copyOfRange(bytes, d2, d2 + l2)
          frames.length < MaxFramesPerVideo
        }
        false
      } else true
    }
    frames.toArray
  }

  private val aviInfoUdf = udf((b: Array[Byte]) => Option(aviInfo(b)))

  /** Header-only video metadata column (struct<width, height,
    * usPerFrame, totalFrames, fourcc>, null for non-AVI) — metadata
    * queries never touch frame data. */
  def videoInfo(bin: Column): Column = aviInfoUdf(bin)

  private def sampledFramesUdf(everyK: Int) = udf { (b: Array[Byte]) =>
    val all = decodeAviFrames(b)
    if (all == null) null
    else Array.range(0, all.length, everyK).map(all(_))
  }

  /** Every k-th decoded frame as its own row: `(idCol, frame_idx,
    * frame)` with `frame_idx` the index in the CONTAINER's frame
    * sequence and `frame` the raw codec payload (a PNG under MPNG).
    * Undecodable videos contribute no rows (null array explodes to
    * nothing) — the quarantine path, matching the image tier. */
  def frames(videos: DataFrame, everyK: Int = 1,
             idCol: String = "video_id", binCol: String = "video"): DataFrame = {
    require(everyK >= 1, "everyK must be at least 1")
    videos
      .select(col(idCol), posexplode(sampledFramesUdf(everyK)(col(binCol))))
      .select(col(idCol), (col("pos") * everyK).as("frame_idx"), col("col").as("frame"))
  }

  /** Perceptual frame hashes: `(idCol, frame_idx, dhash)` — one
    * [[Multimodal.dHashPng]] per sampled frame; frames the PNG
    * decoder rejects surface as null hashes. */
  def frameDHashes(videos: DataFrame, everyK: Int = 1,
                   idCol: String = "video_id", binCol: String = "video"): DataFrame =
    frames(videos, everyK, idCol, binCol)
      .select(col(idCol), col("frame_idx"),
        Multimodal.dhash64(col("frame")).as("dhash"))

  /** Frame-level video near-dup: `(vid_a, vid_b, n_frame_pairs,
    * min_hamming)` for every video pair sharing at least one frame
    * pair within `maxHamming` dHash bits — alignment-free shot-level
    * match semantics (a re-encode, a trim, or an overlay tweak still
    * shares near-identical frames at SOME offset). Deployment of the
    * signature-generic banded hamming join: frame ids are
    * `struct(video, frame_idx)` (structs order lexicographically, so
    * the generic `<`/least/greatest pair normalization just works),
    * identical frames collapse to reps, candidates come from
    * pigeonhole chunk banding, and same-video frame pairs are
    * dropped before the per-pair aggregate. Everything between the
    * frame explode and the final groupBy is the shared machinery
    * q24/q95/q97 already ride. */
  def videoNearDupPairs(videos: DataFrame, maxHamming: Int, everyK: Int = 1,
                        idCol: String = "video_id", binCol: String = "video"): DataFrame = {
    // Materialize the signatures ONCE (r19, guide §2.4/§5): the
    // hamming machinery's bitmask-vs-banding strategy probe counts
    // rows of its input frame, and frame ids are (video, frame_idx)
    // structs — there is no RAW frame whose row count bounds the
    // FRAME count (a video may carry any number of frames), so the
    // image tier's repProbe trick does not apply and the probe would
    // re-execute the full container-walk + PNG-decode + dHash chain
    // a second time (measured: the decode pass is ~half of q101's
    // wall). One eager localCheckpoint of the keys-sized signature
    // frame pays the decode exactly once; probe and aggregate both
    // read the materialized rows.
    val sigs = frameDHashes(videos, everyK, idCol, binCol)
      .select(struct(col(idCol).as("vid"), col("frame_idx").as("idx")).as("fid"),
        col("dhash"))
      .localCheckpoint(true)
    val framePairs = Dedup.hammingNearDupPairs(
      sigs, sigBits = 64, maxHamming = maxHamming, idCol = "fid", sigCol = "dhash")
    framePairs
      .filter(col("doc_a.vid") =!= col("doc_b.vid"))
      .select(
        least(col("doc_a.vid"), col("doc_b.vid")).as("vid_a"),
        greatest(col("doc_a.vid"), col("doc_b.vid")).as("vid_b"),
        col("hamming"))
      .groupBy(col("vid_a"), col("vid_b"))
      .agg(count(lit(1)).as("n_frame_pairs"), min(col("hamming")).as("min_hamming"))
  }
}
