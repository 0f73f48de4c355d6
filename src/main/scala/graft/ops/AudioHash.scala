package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Perceptual AUDIO dedup — the audio leg of the multimodal↔dedup
  * bridge ([[ImageHash]] is the image leg): a 64-bit energy-envelope
  * fingerprint over REAL decoded PCM + the shared Hamming-banded
  * candidate join. The fingerprint is the first stage of the classic
  * audio-fingerprinting stack (Haitsma–Kalker / Chromaprint reduce
  * band-energy differences to sign bits exactly like this; here the
  * bands are temporal windows, the piece the bare JDK can compute
  * without an FFT library while keeping every step integer-exact).
  *
  * Fingerprint: split the first 65·`winLen` decoded samples into 65
  * equal windows; window energy E_i = Σ|x| (exact integers — PCM is
  * lossless); bit i (0..63) is set iff E_i < E_{i+1} strictly. A pure
  * function of decoded samples, reproducible across JVMs and
  * partitionings. Near-dup join: [[Hamming.bandedPairs]] — recall at
  * Hamming ≤ 7 is pigeonhole-guaranteed, shuffle bounded by band
  * buckets, never corpus².
  */
object AudioHash {

  /** Windows per fingerprint: 64 adjacent-energy compares need 65. */
  val NumWindows = 65

  /** A real 16-bit mono WAV whose [[envFingerprint64]] is EXACTLY
    * `target`: 65 windows of `winLen` samples, each an alternating
    * ±a_i square wave whose amplitude staircases from `base` (`+step`
    * on a set target bit, `-step` on clear). Σ|x| per window is exactly
    * a_i·winLen, amplitudes stay within [base−64·step, base+64·step]
    * (callers keep that inside int16), and PCM is lossless — so the
    * encode→decode→fingerprint round trip is bit-exact, the synthetic
    * fixture the gate's integer-exact oracle is built on.
    */
  def buildStairWav(target: Long, winLen: Int = 64, base: Int = 16384,
                    step: Int = 200): Array[Byte] = {
    require(winLen >= 1 && step >= 1 && base - 64 * step >= 1 &&
      base + 64 * step <= 32767,
      s"buildStairWav: base=$base step=$step must move the staircase " +
        "and stay inside int16 over 64 steps")
    val n = NumWindows * winLen
    val pcm = new Array[Byte](n * 2)
    var amp = base
    var w = 0
    while (w < NumWindows) {
      var j = 0
      while (j < winLen) {
        val i = w * winLen + j
        val v = if (j % 2 == 0) amp else -amp
        pcm(i * 2) = (v & 0xff).toByte
        pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
        j += 1
      }
      if (w < 64)
        amp += (if ((target & (1L << w)) != 0) step else -step)
      w += 1
    }
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The 64-bit energy-envelope fingerprint of an encoded audio file
    * (via the [[Multimodal.decodeAudioSamples]] real-decode path), or
    * None when the bytes don't decode or are shorter than 65·`winLen`
    * samples.
    */
  def envFingerprint64(bytes: Array[Byte], winLen: Int = 64)
  : Option[Long] = {
    val xs = Multimodal.decodeAudioSamples(bytes)
    if (xs.length < NumWindows * winLen) None
    else {
      val e = new Array[Long](NumWindows)
      var w = 0
      while (w < NumWindows) {
        var s = 0L
        var j = 0
        while (j < winLen) { s += math.abs(xs(w * winLen + j).toLong); j += 1 }
        e(w) = s
        w += 1
      }
      var fp = 0L
      var i = 0
      while (i < 64) {
        if (e(i) < e(i + 1)) fp |= 1L << i
        i += 1
      }
      Some(fp)
    }
  }

  /** (id, afp) for every decodable clip of `media` — one map-side pass,
    * undecodable/short blobs dropped.
    */
  def fingerprints(media: Dataset[MediaFile], winLen: Int = 64)
  : DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.flatMap(m => envFingerprint64(m.bytes, winLen)
      .map(h => (m.id, h))).toDF("id", "afp")
  }

  /** Near-duplicate audio pairs (id_a < id_b, hamming ≤ maxHamming) via
    * the shared banded join; clips decode exactly once (pinned hashes).
    */
  def audioNearDupPairs(media: Dataset[MediaFile], maxHamming: Int,
                        winLen: Int = 64): DataFrame =
    Hamming.bandedPairs(Pin.pin(fingerprints(media, winLen)), "id", "afp",
      maxHamming, "audioNearDupPairs")
}
