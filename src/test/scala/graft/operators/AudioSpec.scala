package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.AudioOps

/** Audio pipeline over synthesized WAV fixtures: decode → info →
  * qualification (P7/A5) → resample (X1) → normalize (X2) → ordered
  * concat (X3/A12/W1) → segment (X7). The E3 audio stage end to end
  * on a local corpus. */
class AudioSpec extends SparkSuite {
  import spark.implicits._

  private def ramp(n: Int, scale: Float): Array[Float] =
    Array.tabulate(n)(i => (i % 100) / 100.0f * scale)

  // book "a": two parts, 16 kHz, deliberately out of order;
  // book "b": one part at 8 kHz (below the 16 kHz gate).
  private lazy val parts = Seq(
    ("a", 2, AudioOps.toWavBytes(ramp(1600, 0.5f), 16000)),
    ("a", 1, AudioOps.toWavBytes(ramp(3200, 0.5f), 16000)),
    ("b", 1, AudioOps.toWavBytes(ramp(800, 0.25f), 8000))
  ).toDF("book", "seq", "wav")

  test("X4 wav info reads header without decoding") {
    val got = parts.select(col("book"), col("seq"), Audio.info(col("wav")).as("i"))
      .select(col("book"), col("seq"), col("i.sampleRate"), col("i.numSamples"), col("i.durationSec"))
      .as[(String, Int, Int, Long, Double)].collect().toSet
    assert(got == Set(
      ("a", 2, 16000, 1600L, 0.1),
      ("a", 1, 16000, 3200L, 0.2),
      ("b", 1, 8000, 800L, 0.1)))
  }

  test("P7/A5 qualification by min sample rate per book") {
    val withSr = parts.select(col("book"), Audio.info(col("wav")).getField("sampleRate").as("sr"))
    val q = Audio.qualifyBooks(withSr, "book", "sr", 16000)
      .select("book", "qualified").as[(String, Boolean)].collect().toMap
    assert(q == Map("a" -> true, "b" -> false))
  }

  test("decode round-trips PCM16 quantization") {
    val s = parts.filter(col("book") === "b")
      .select(Audio.decode(col("wav")).as("s")).as[Seq[Float]].head()
    assert(s.length == 800)
    // 0.25f * (i%100)/100 quantized to 16 bits — within 1/32768.
    assert(math.abs(s(50) - 0.125f) < 2.0f / 32768)
  }

  test("X1 resample halves length; X2 normalize peaks at 0.95") {
    val df = parts.filter(col("book") === "a" && col("seq") === 1)
      .select(Audio.decode(col("wav")).as("s"))
      .select(Audio.resample(col("s"), lit(16000), 8000).as("r"))
      .select(Audio.normalize(col("r")).as("n"))
    val n = df.as[Seq[Float]].head()
    assert(n.length == 1600)
    val peak = n.map(math.abs).max
    assert(math.abs(peak - 0.95f) < 1e-3, s"peak $peak")
  }

  test("X3 ordered concat assembles parts by seq, not input order") {
    val decoded = parts.filter(col("book") === "a")
      .select(col("book"), col("seq"), Audio.decode(col("wav")).as("samples"))
    val out = Audio.concatParts(decoded, "book", "seq", "samples")
    val (samples, nParts) = out.select("samples", "n_parts").as[(Seq[Float], Long)].head()
    assert(nParts == 2)
    assert(samples.length == 4800)
    // seq 1 (3200 samples) must come first even though it was second
    // in input order: position 3250 sits in seq-2's ramp restart.
    assert(math.abs(samples(3200) - 0.0f) < 1e-3)
    assert(math.abs(samples(3250) - 0.25f) < 1e-3) // (50%100)/100*0.5
  }

  test("X7 segment cuts the requested window") {
    val decoded = parts.filter(col("book") === "a" && col("seq") === 1)
      .select(Audio.decode(col("wav")).as("s"), lit(16000).as("sr"))
    val seg = decoded.select(
      Audio.segment(col("s"), col("sr"), lit(0.05), lit(0.1)).as("seg"))
      .as[Seq[Float]].head()
    assert(seg.length == 1600)
    // segment starts at sample 800 -> (800%100)/100*0.5 = 0.0
    assert(math.abs(seg.head - 0.0f) < 1e-3)
  }

  /** A 60-bit pattern as a 65-frame constant-amplitude WAV whose
    * envelope hash IS the pattern (q97 fixture walk). */
  private def patternWav(pat: Long): Array[Byte] = {
    val amps = new Array[Int](65)
    amps(0) = 16000
    for (b <- 0 until 64)
      amps(b + 1) = amps(b) + (if (((pat >>> b) & 1L) == 1L) -200 else 200)
    val samples = Array.tabulate(65 * 64)(i => amps(i / 64) / 32768.0f)
    graft.functions.AudioOps.toWavBytes(samples, 16000)
  }

  test("envelope hash of a constant-frame WAV equals its construction pattern") {
    for (pat <- Seq(0L, 0x5A5A5A5A5A5A5A5L, (1L << 60) - 1)) {
      assert(graft.functions.AudioOps.envelopeHash64(patternWav(pat)) == pat, f"pattern $pat%x")
    }
    // one flipped pattern bit flips exactly that hash bit
    val base = 0x123456789ABCDEFL
    assert(java.lang.Long.bitCount(
      graft.functions.AudioOps.envelopeHash64(patternWav(base)) ^
        graft.functions.AudioOps.envelopeHash64(patternWav(base ^ (1L << 26)))) == 1)
    assert(graft.functions.AudioOps.envelopeHash64("not audio".getBytes) == null)
    // envelope hash is volume-scale sensitive only through gradient
    // SIGNS: doubling every amplitude preserves the hash
    val doubled = {
      val amps = new Array[Int](65)
      amps(0) = 16000
      for (b <- 0 until 64)
        amps(b + 1) = amps(b) + (if (((base >>> b) & 1L) == 1L) -200 else 200)
      val samples = Array.tabulate(65 * 64)(i => amps(i / 64) * 2 / 65536.0f)
      graft.functions.AudioOps.toWavBytes(samples, 16000)
    }
    assert(graft.functions.AudioOps.envelopeHash64(doubled) ==
      graft.functions.AudioOps.envelopeHash64(patternWav(base)))
  }

  test("X1 sinc resample: beats linear on a pure tone, preserves DC, anti-aliases") {
    import graft.functions.AudioOps
    // 440 Hz tone, 8 kHz -> 16 kHz upsample: compare both kernels
    // against the analytic sine at the output rate (interior
    // samples only — edge taps are truncation-normalized).
    val f = 440.0
    val in = Array.tabulate(8000)(i => math.sin(2 * math.Pi * f * i / 8000.0).toFloat)
    val ref = Array.tabulate(16000)(i => math.sin(2 * math.Pi * f * i / 16000.0).toFloat)
    def rmse(got: Array[Float]): Double = {
      val lo = 200; val hi = got.length - 200
      math.sqrt((lo until hi).map(i => math.pow(got(i) - ref(i), 2)).sum / (hi - lo))
    }
    val linErr = rmse(AudioOps.resampleLinear(in, 8000, 16000))
    val sincErr = rmse(AudioOps.resampleSinc(in, 8000, 16000))
    assert(sincErr < linErr / 20,
      s"sinc ($sincErr) must beat linear ($linErr) by >20x on a pure tone")
    assert(sincErr < 1e-4)
    // DC exactness at EVERY output index (the weight-normalization
    // claim): a constant signal resamples to exactly itself.
    val dc = Array.fill(1000)(0.5f)
    assert(AudioOps.resampleSinc(dc, 16000, 7350).forall(x => math.abs(x - 0.5f) < 1e-6))
    // Anti-aliasing on downsample: a 7 kHz tone at 16 kHz is above
    // the 4 kHz Nyquist of an 8 kHz target — sinc must attenuate it
    // (linear folds it back as a loud alias).
    val hiTone = Array.tabulate(16000)(i => math.sin(2 * math.Pi * 7000.0 * i / 16000.0).toFloat)
    def energy(a: Array[Float]): Double = a.map(x => x.toDouble * x).sum / a.length
    val sincDown = energy(AudioOps.resampleSinc(hiTone, 16000, 8000))
    val linDown = energy(AudioOps.resampleLinear(hiTone, 16000, 8000))
    assert(sincDown < 0.005, s"aliased energy must be suppressed, got $sincDown")
    assert(sincDown < linDown / 10)
    // Degenerate inputs mirror the linear kernel's contract.
    assert(AudioOps.resampleSinc(null, 8000, 16000) == null)
    assert(AudioOps.resampleSinc(in, 8000, 8000) eq in)
  }

  test("audio near-dup pairs: clusters at hamming <= 2, garbage quarantined") {
    val baseA = 0x0F0F0F0F0F0F0F0L
    val baseB = 0x70707070707070FL
    val clips = Seq(
      (0L, patternWav(baseA)),
      (1L, patternWav(baseA ^ (1L << 13))),
      (2L, patternWav(baseA ^ (1L << 26))),
      (10L, patternWav(baseB)),
      (11L, patternWav(baseB ^ (1L << 39))),
      (99L, "garbage".getBytes)).toDF("clip_id", "audio")
    val pairs = Audio.audioNearDupPairs(clips, maxHamming = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((0L, 1L, 1), (0L, 2L, 1), (1L, 2L, 2), (10L, 11L, 1)))
  }
}
