package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** The per-frame video dedup contract:
  *
  *   1. staircase JPEG frames survive the encode→container→decode→dHash
  *      round trip BIT-EXACT (8×8-aligned uniform blocks at quality
  *      0.95 — the argument in [[VideoHash.buildStairJpeg]]'s doc, here
  *      actually measured over random targets);
  *   2. the frame-aligned banded join finds exactly the video pairs
  *      with equal frame counts and summed distance within the radius,
  *      and never pairs videos of different lengths;
  *   3. the radius fence throws past the 8-band guarantee.
  */
class VideoHashSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "VideoHash"

  it should "round-trip arbitrary frame targets through the MJPEG AVI" in {
    val rnd = new Random(42)
    (1 to 50).foreach { _ =>
      val targets = Seq.fill(3)(rnd.nextLong())
      val avi = VideoHash.buildStairMjpegAvi(targets)
      val hashes = Multimodal.mjpegFrameBytes(avi)
        .flatMap(ImageHash.dHash64)
      hashes shouldBe targets
    }
  }

  it should "find exactly the equal-length pairs within the summed " +
    "radius" in {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    val base = Seq.fill(3)(rnd.nextLong())
    // video k: frame f differs from base(f) in k_f bits with
    // k_0 + k_1 + k_2 = k (spread one bit per band position)
    def flip(h: Long, k: Int, salt: Int): Long =
      (0 until k).foldLeft(h)((acc, j) =>
        acc ^ (1L << ((j * 7 + salt * 3) % 64)))
    def video(id: Long, perFrame: Seq[Int]): MediaFile =
      MediaFile(id, "avi", VideoHash.buildStairMjpegAvi(
        base.zip(perFrame).zipWithIndex.map { case ((b, k), f) =>
          flip(b, k, f)
        }))
    val media = Seq(
      video(0L, Seq(0, 0, 0)),
      video(1L, Seq(1, 1, 0)), // total 2 vs v0
      video(2L, Seq(2, 2, 2)), // total 6 vs v0, 4 vs v1 (nested flips)
      // different length: never a pair regardless of distance
      MediaFile(3L, "avi", VideoHash.buildStairMjpegAvi(base.take(2)))
    ).toDS()
    val got = VideoHash.videoNearDupPairs(media, maxTotalHamming = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    got shouldBe Set((0L, 1L, 3L, 2L), (1L, 2L, 3L, 4L))
  }

  it should "fence radii past the 8-band recall guarantee" in {
    val s = spark
    import s.implicits._
    val media = Seq(MediaFile(1L, "avi",
      VideoHash.buildStairMjpegAvi(Seq(0L)))).toDS()
    val e = intercept[IllegalArgumentException] {
      VideoHash.videoNearDupPairs(media, maxTotalHamming = 8)
    }
    e.getMessage should include("guaranteed-recall")
  }
}
