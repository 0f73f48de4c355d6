package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** The perceptual-dedup contract (r12 verdict #6):
  *
  *   1. the PNG synthesizer → ImageIO decode → dHash round trip is
  *      BIT-EXACT for arbitrary 64-bit targets (the integer-exact
  *      fixture the gate oracle relies on);
  *   2. the banded join's recall guarantee: a pair at Hamming distance
  *      d ≤ maxHamming ≤ 7 is ALWAYS found, a pair past maxHamming
  *      never returned;
  *   3. dHash is resize-invariant across uniform block scales (the
  *      box-average grid, not pixel identity, defines the hash);
  *   4. the radius fence throws past the 8-band guarantee.
  */
class ImageHashSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "ImageHash"

  it should "round-trip arbitrary targets through PNG encode/decode" in {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val target = rnd.nextLong()
      ImageHash.dHash64(ImageHash.buildGrayPng(target)) shouldBe
        Some(target)
    }
    // and at other uniform block scales (resize invariance of the grid)
    val t = 0x0123456789abcdefL
    ImageHash.dHash64(ImageHash.buildGrayPng(t, cell = 1)) shouldBe Some(t)
    ImageHash.dHash64(ImageHash.buildGrayPng(t, cell = 7)) shouldBe Some(t)
  }

  it should "return None for undecodable bytes and sub-grid images" in {
    ImageHash.dHash64(Array[Byte](1, 2, 3)) shouldBe None
    val tiny = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(tiny, "png", bos)
    ImageHash.dHash64(bos.toByteArray) shouldBe None
  }

  it should "find exactly the pairs within the Hamming radius through " +
    "the banded join" in {
    val s = spark
    import s.implicits._
    val base = new Random(7).nextLong()
    // image k differs from image 0 in exactly k bits (positions spread
    // across bands), k = 0..9
    def flip(h: Long, k: Int): Long =
      (0 until k).foldLeft(h)((acc, j) => acc ^ (1L << (j * 7)))
    val media = (0 to 9).map { k =>
      MediaFile(k.toLong, "png", ImageHash.buildGrayPng(flip(base, k)))
    }.toDS()
    val got = ImageHash.perceptualNearDupPairs(media, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // distance between images a and b is |a - b| here (nested flips)
    val want = (for {
      a <- 0 to 9; b <- (a + 1) to 9 if b - a <= 5
    } yield (a.toLong, b.toLong, (b - a).toLong)).toSet
    got shouldBe want
  }

  it should "fence radii past the 8-band recall guarantee" in {
    val s = spark
    import s.implicits._
    val media = Seq(MediaFile(1L, "png",
      ImageHash.buildGrayPng(0L))).toDS()
    val e = intercept[IllegalArgumentException] {
      ImageHash.perceptualNearDupPairs(media, maxHamming = 8)
    }
    e.getMessage should include("guaranteed-recall")
  }
}
