package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Hashing

/** The toy WAV codec (G8): encoder/decoder kernel properties, pure JVM.
  * The Spark-side pipeline (mm_audio_features / mm_audio_vad) is pinned
  * by the DuckDB oracle; these pin the kernels themselves, including on
  * inputs the generator never produces (non-canonical chunk layouts —
  * the decoder must be a real RIFF walker, not a fixed-offset read). */
class AudioSpec extends AnyFunSuite {

  private def bruteFeatures(samples: Array[Int]): (Long, Long, Long, Long) = {
    val peak = samples.map(s => math.abs(s.toLong)).max
    val sumAbs = samples.map(s => math.abs(s.toLong)).sum
    val zc = (1 until samples.length)
      .count(i => (samples(i) >= 0) != (samples(i - 1) >= 0)).toLong
    var sig = 0L
    for (i <- 0 until math.min(samples.length - 1, 64))
      if (math.abs(samples(i + 1).toLong) > math.abs(samples(i).toLong))
        sig |= 1L << i
    (peak, sumAbs, zc, sig)
  }

  private def samplesOf(seed: Long, silent: Boolean): Array[Int] =
    Array.tabulate(AudioKernels.NumSamples)(i =>
      AudioKernels.pcmSample(seed, i, silent))

  test("encode->decode recovers header fields and brute-force stats") {
    for (seed <- Seq(0L, 1L, 5L, 42L, 9999L, Long.MaxValue / 64);
         silent <- Seq(false, true)) {
      val row = AudioKernels.wavFeatures(AudioKernels.wavEncode(seed, silent))
      assert(row != null, s"decode failed for seed $seed silent=$silent")
      assert(row.getLong(0) == 8000L && row.getLong(1) == 64L)
      val (peak, sumAbs, zc, sig) = bruteFeatures(samplesOf(seed, silent))
      assert(row.getLong(2) == peak, s"peak mismatch seed=$seed")
      assert(row.getLong(3) == sumAbs, s"sum_abs mismatch seed=$seed")
      assert(row.getLong(4) == zc, s"zero_crossings mismatch seed=$seed")
      assert(row.getLong(5) == sig, s"env_sig mismatch seed=$seed")
    }
  }

  test("silent frames are bounded at |s| <= 128, voiced frames are not") {
    for (seed <- 0L until 50L) {
      val silentPeak = AudioKernels
        .wavFeatures(AudioKernels.wavEncode(seed, silent = true)).getLong(2)
      assert(silentPeak <= 128L)
    }
    // at least one voiced frame in any 50 exceeds the silent bound by far
    val voicedPeaks = (0L until 50L).map(seed => AudioKernels
      .wavFeatures(AudioKernels.wavEncode(seed, silent = false)).getLong(2))
    assert(voicedPeaks.max > 16384L)
  }

  test("wav gain: exact truncating scale, int16 clipping, negative rounding, null contract (G16)") {
    // driver recompute over both populations at the query's x1.25
    for (seed <- Seq(0L, 3L, 42L); silent <- Seq(false, true)) {
      val src = AudioKernels.wavEncode(seed, silent)
      val gained = AudioKernels.wavGain(src, 1250)
      assert(gained != null)
      val row = AudioKernels.wavFeatures(gained)
      assert(row != null && row.getLong(0) == 8000L && row.getLong(1) == 64L)
      val expect = samplesOf(seed, silent).map { s =>
        val g = s.toLong * 1250L / 1000L // truncation, the DSP native
        math.max(-32768L, math.min(32767L, g)).toInt
      }
      val (peak, sumAbs, zc, sig) = bruteFeatures(expect)
      assert((row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
        == (peak, sumAbs, zc, sig), s"seed=$seed silent=$silent")
      // voiced frames MUST exercise the clamp at x1.25 (|s| can reach
      // 32768 pre-gain); silent frames must not (|s| <= 128)
      if (!silent && seed == 0L)
        assert(expect.exists(s => s == 32767 || s == -32768))
      if (silent) assert(expect.forall(s => math.abs(s) <= 160))
    }
    // truncation semantics: -3 * 1250 / 1000 rounds toward zero to -3
    // (floor would give -4) — the convention DuckDB's `//` shares, so
    // the oracle's negative samples agree to the LSB
    val hand = {
      val buf = AudioKernels.wavEncode(7L, silent = true)
      // overwrite sample 0 with -3
      buf(AudioKernels.HeaderBytes) = (-3 & 0xff).toByte
      buf(AudioKernels.HeaderBytes + 1) = ((-3 >> 8) & 0xff).toByte
      buf
    }
    val g0 = {
      val out = AudioKernels.wavGain(hand, 1250)
      val lo = out(AudioKernels.HeaderBytes) & 0xff
      val hi = out(AudioKernels.HeaderBytes + 1) & 0xff
      ((lo | (hi << 8)).toShort).toInt
    }
    assert(g0 == -3, s"negative rounding must truncate toward zero, got $g0")
    // identity gain is byte-stable through the canonical re-emit
    assert(AudioKernels.wavGain(AudioKernels.wavEncode(5L, silent = false),
      1000).toSeq == AudioKernels.wavEncode(5L, silent = false).toSeq)
    // null contract
    assert(AudioKernels.wavGain(null, 1250) == null)
    assert(AudioKernels.wavGain("junk".getBytes, 1250) == null)
    assert(AudioKernels.wavGain(AudioKernels.wavEncode(1L, false), 0) == null)
  }

  test("decoder is a generic RIFF walker: extra chunk before fmt/data, odd-size padding") {
    // hand-build: RIFF [ "JUNK" (5 bytes, padded) ] [ fmt ] [ data (2 samples) ]
    val samples = Seq(1000, -2000)
    val junkLen = 5
    val junkPadded = junkLen + 1 // odd sizes pad to even per RIFF
    val total = 12 + (8 + junkPadded) + (8 + 16) + (8 + 4)
    val buf = new Array[Byte](total)
    var off = 0
    def tag(s: String): Unit = { for (c <- s) { buf(off) = c.toByte; off += 1 } }
    def le32(v: Int): Unit = { for (j <- 0 until 4) { buf(off) = ((v >>> (8 * j)) & 0xff).toByte; off += 1 } }
    def le16(v: Int): Unit = { for (j <- 0 until 2) { buf(off) = ((v >>> (8 * j)) & 0xff).toByte; off += 1 } }
    tag("RIFF"); le32(total - 8); tag("WAVE")
    tag("JUNK"); le32(junkLen); off += junkPadded // zero payload + pad
    tag("fmt "); le32(16)
    le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    tag("data"); le32(4)
    samples.foreach(s => le16(s & 0xffff))
    val row = AudioKernels.wavFeatures(buf)
    assert(row != null, "chunk walker failed on non-canonical layout")
    assert(row.getLong(1) == 2L)
    assert(row.getLong(2) == 2000L) // peak
    assert(row.getLong(3) == 3000L) // sum_abs
    assert(row.getLong(4) == 1L)    // one sign change
    assert(row.getLong(5) == 1L)    // |−2000| > |1000| -> bit 0
  }

  test("decoder rejects malformed bytes with null, never throws") {
    assert(AudioKernels.wavFeatures(null) == null)
    assert(AudioKernels.wavFeatures(Array.emptyByteArray) == null)
    assert(AudioKernels.wavFeatures(
      "definitely not audio, just some text payload!!!".getBytes("UTF-8")) == null)
    // valid magic, truncated data chunk
    val truncated = AudioKernels.wavEncode(42L, silent = false).take(60)
    assert(AudioKernels.wavFeatures(truncated) == null)
    // stereo flag rejected (decoder is PCM16-mono-only)
    val stereo = AudioKernels.wavEncode(42L, silent = false).clone()
    stereo(22) = 2
    assert(AudioKernels.wavFeatures(stereo) == null)
    // non-PCM audio format rejected
    val ieee = AudioKernels.wavEncode(42L, silent = false).clone()
    ieee(20) = 3
    assert(AudioKernels.wavFeatures(ieee) == null)
  }

  test("pcm samples replay the documented mix64 spec") {
    for (seed <- Seq(0L, 7L, 123L); i <- Seq(0, 1, 63)) {
      val d = Hashing.mix64(seed * 64 + i)
      assert(AudioKernels.pcmSample(seed, i, silent = false) ==
        (d & 0xffffL).toInt - 32768)
      assert(AudioKernels.pcmSample(seed, i, silent = true) ==
        (d & 0xffL).toInt - 128)
    }
  }
}
