package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Perceptual image dedup (r12 verdict #6): dHash over REAL decoded
  * pixels + a Hamming-banded candidate join — the multimodal↔dedup
  * bridge a pretraining pipeline runs over its image corpus (the text
  * corpus analogue is [[Dedup.simHashPairs]]; the banding discipline is
  * the same).
  *
  * dHash (difference hash): box-average the decoded image to a 9×8 luma
  * grid, emit one bit per horizontally adjacent cell pair
  * (`avg(r,c) < avg(r,c+1)`), 8 rows × 8 comparisons = 64 bits. All
  * arithmetic is INTEGER-EXACT — luma is the 299/587/114 fixed-point
  * weighting, box averages are compared as cross-multiplied sums — so a
  * hash is a pure function of decoded pixels, reproducible across JVMs
  * and partitionings (no float resize, no Graphics2D resampling).
  *
  * Near-dup join: split each hash into 8 bands of 8 bits; two images
  * sharing ANY band value become a candidate pair; candidates verify
  * exactly by popcount of the XOR. By pigeonhole, a pair within Hamming
  * distance ≤ 7 differs in at most 7 bands, so it SHARES at least one —
  * recall at `maxHamming ≤ 7` is guaranteed, not probabilistic. The
  * shuffle is Σ bucket², never corpus² (the LSH-band discipline of
  * [[Dedup.minHashPairs]]).
  */
object ImageHash {

  /** Bands per hash (8 × 8 bits): full recall up to Hamming distance 7. */
  val NumBands = Hamming.NumBands

  /** Fixed-point luma of one packed sRGB pixel (×1000: 299r+587g+114b). */
  private def luma1000(rgb: Int): Long =
    ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
      (rgb & 0xff) * 114L

  /** The 64-bit dHash of an encoded image (PNG/JPEG/GIF/BMP via the
    * JDK's ImageIO — the [[Multimodal.decode]] path), or None when the
    * bytes don't decode or the image is smaller than the 9×8 grid. Bit
    * `r*8+c` is set iff the average luma of grid cell (r,c) is strictly
    * below cell (r,c+1)'s; cells are the floor-boundary boxes
    * `x ∈ [c·w/9, (c+1)·w/9)`, `y ∈ [r·h/8, (r+1)·h/8)` and the
    * comparison cross-multiplies (sumA·areaB < sumB·areaA) so unequal
    * box sizes never force a rounding rule.
    */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Throwable => null }
    if (img == null || img.getWidth < 9 || img.getHeight < 8) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val sums = Array.ofDim[Long](8, 9)
      val areas = Array.ofDim[Long](8, 9)
      var r = 0
      while (r < 8) {
        val y0 = r * h / 8
        val y1 = (r + 1) * h / 8
        var c = 0
        while (c < 9) {
          val x0 = c * w / 9
          val x1 = (c + 1) * w / 9
          var s = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += luma1000(img.getRGB(x, y)); x += 1 }
            y += 1
          }
          sums(r)(c) = s
          areas(r)(c) = (y1 - y0).toLong * (x1 - x0)
          c += 1
        }
        r += 1
      }
      var hash = 0L
      r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (sums(r)(c) * areas(r)(c + 1) <
            sums(r)(c + 1) * areas(r)(c))
            hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      Some(hash)
    }
  }

  /** A real RGB PNG whose [[dHash64]] is EXACTLY `target`: each grid
    * row is a ±8 gray staircase starting at 128 (ascend on a set bit,
    * descend on clear), drawn as `cell`×`cell` uniform blocks of a
    * 9·cell × 8·cell image. RGB PNG is lossless and color-managed-free
    * on the decode path, and uniform blocks box-average to themselves,
    * so the encode→decode→hash round trip is bit-exact — the synthetic
    * fixture the gate's integer-exact oracle is built on.
    */
  def buildGrayPng(target: Long, cell: Int = 4): Array[Byte] = {
    require(cell >= 1, "buildGrayPng: cell must be >= 1")
    val img = new java.awt.image.BufferedImage(
      9 * cell, 8 * cell, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var v = 128
      var c = 0
      while (c < 9) {
        val rgb = (v << 16) | (v << 8) | v
        var y = r * cell
        while (y < (r + 1) * cell) {
          var x = c * cell
          while (x < (c + 1) * cell) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        if (c < 8)
          v += (if ((target & (1L << (r * 8 + c))) != 0) 8 else -8)
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (id, dhash) for every decodable image of `media` — one map-side
    * pass, undecodable blobs dropped.
    */
  def dHashes(media: Dataset[MediaFile]): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.flatMap(m => dHash64(m.bytes).map(h => (m.id, h)))
      .toDF("id", "dhash")
  }

  /** Near-duplicate image pairs (id_a < id_b, hamming ≤ maxHamming) via
    * the banded candidate join: hashes pin once (images decode exactly
    * once however many bands reference them), band rows are 3 narrow
    * columns, candidate pairs dedup BEFORE the popcount verify. Full
    * recall is guaranteed for maxHamming ≤ 7 (see the object doc);
    * above 7 the bands are a candidate generator only — fail loudly
    * rather than silently losing recall.
    */
  def perceptualNearDupPairs(media: Dataset[MediaFile],
                             maxHamming: Int): DataFrame =
    Hamming.bandedPairs(Pin.pin(dHashes(media)), "id", "dhash",
      maxHamming, "perceptualNearDupPairs")
}
