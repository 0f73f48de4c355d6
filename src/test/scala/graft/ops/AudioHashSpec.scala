package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** The audio-fingerprint dedup contract (the [[ImageHashSpec]] shape on
  * the audio leg):
  *
  *   1. the stair-WAV synthesizer → javax.sound decode → energy-envelope
  *      fingerprint round trip is BIT-EXACT for arbitrary targets (PCM
  *      is lossless — unlike JPEG there is no quality knob to argue
  *      about);
  *   2. the banded join finds exactly the pairs within the radius;
  *   3. undecodable / too-short clips fingerprint to None;
  *   4. the radius fence throws past the 8-band guarantee.
  */
class AudioHashSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "AudioHash"

  it should "round-trip arbitrary targets through WAV encode/decode" in {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val target = rnd.nextLong()
      AudioHash.envFingerprint64(AudioHash.buildStairWav(target)) shouldBe
        Some(target)
    }
    // other window lengths — the envelope grid, not a fixed duration,
    // defines the fingerprint
    val t = 0x0123456789abcdefL
    AudioHash.envFingerprint64(
      AudioHash.buildStairWav(t, winLen = 8), winLen = 8) shouldBe Some(t)
    AudioHash.envFingerprint64(
      AudioHash.buildStairWav(t, winLen = 100), winLen = 100) shouldBe
      Some(t)
  }

  it should "return None for undecodable and too-short clips" in {
    AudioHash.envFingerprint64(Array[Byte](1, 2, 3)) shouldBe None
    // a real WAV, but shorter than the 65-window envelope grid
    val shortWav = Multimodal.buildSquareWav(100, 10, 1000)
    AudioHash.envFingerprint64(shortWav, winLen = 64) shouldBe None
  }

  it should "find exactly the pairs within the Hamming radius through " +
    "the banded join" in {
    val s = spark
    import s.implicits._
    val base = new Random(7).nextLong()
    def flip(h: Long, k: Int): Long =
      (0 until k).foldLeft(h)((acc, j) => acc ^ (1L << (j * 7)))
    val media = (0 to 9).map { k =>
      MediaFile(k.toLong, "wav", AudioHash.buildStairWav(flip(base, k)))
    }.toDS()
    val got = AudioHash.audioNearDupPairs(media, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = (for {
      a <- 0 to 9; b <- (a + 1) to 9 if b - a <= 5
    } yield (a.toLong, b.toLong, (b - a).toLong)).toSet
    got shouldBe want
  }

  it should "fence radii past the 8-band recall guarantee" in {
    val s = spark
    import s.implicits._
    val media = Seq(MediaFile(1L, "wav",
      AudioHash.buildStairWav(0L))).toDS()
    val e = intercept[IllegalArgumentException] {
      AudioHash.audioNearDupPairs(media, maxHamming = 8)
    }
    e.getMessage should include("guaranteed-recall")
  }
}
