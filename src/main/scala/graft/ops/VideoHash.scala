package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Perceptual VIDEO dedup — the third leg of the multimodal↔dedup
  * bridge ([[ImageHash]] images, [[AudioHash]] audio): per-frame dHash
  * signatures over REALLY decoded MJPEG frames + a frame-aligned
  * Hamming-banded candidate join. This is the shot-for-shot near-dup
  * pass a video corpus runs before training (re-encodes, container
  * swaps, small overlays — same frames, slightly different pixels).
  *
  * Signature: every frame of the container (real AVI walk + ImageIO
  * JPEG decode) hashes to its integer-exact 64-bit dHash
  * ([[ImageHash.dHash64]]); a video IS its ordered frame-hash sequence.
  * Two videos are near-dups when they have the SAME frame count and the
  * summed per-frame Hamming distance is ≤ `maxTotalHamming`.
  *
  * Join discipline: band rows are (frame_idx, band, value) — a
  * candidate needs some FRAME-ALIGNED band collision. If the total
  * distance is ≤ 7 then every frame's distance is ≤ 7, so every frame
  * pair shares a band (pigeonhole over [[Hamming.NumBands]]) — recall
  * at `maxTotalHamming ≤ 7` is guaranteed. Shuffle is bounded by
  * Σ bucket² over (frame, band, value) buckets, never corpus².
  */
object VideoHash {

  /** Encode one image as JPEG at an explicit quality — the default
    * writer quality (~0.75) quantizes DC coefficients coarsely enough
    * to flip staircase comparisons; at 0.95 the luminance DC error is
    * ≤ ~2 gray levels, far under the staircase step.
    */
  def encodeJpeg(img: java.awt.image.BufferedImage,
                 quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(
      javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null),
        param)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** A JPEG frame whose decoded [[ImageHash.dHash64]] is `target`: the
    * [[ImageHash.buildGrayPng]] gray staircase (±`step` per grid cell)
    * drawn as `cell`×`cell` uniform blocks and JPEG-encoded at
    * `quality`. With `cell = 8` every dHash grid cell IS one JPEG 8×8
    * block — blocks code independently, so a uniform block survives as
    * a uniform block up to DC quantization (≤ ~2 gray at 0.95), and the
    * staircase margin `step` ≫ that error keeps every comparison's sign
    * intact: the encode→decode→hash round trip reproduces `target`
    * exactly (the gate still pins `roundtrip_ok` in-row rather than
    * trusting this argument).
    */
  def buildStairJpeg(target: Long, cell: Int = 8, step: Int = 12,
                     quality: Float = 0.95f): Array[Byte] = {
    require(step * 8 <= 96 && step > 4,
      s"buildStairJpeg: step=$step must keep 128±8·step inside [0,255] " +
        "with margin above JPEG DC error")
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
          v += (if ((target & (1L << (r * 8 + c))) != 0) step else -step)
        c += 1
      }
      r += 1
    }
    encodeJpeg(img, quality)
  }

  /** A real MJPEG AVI whose frame f decodes to dHash `targets(f)`. */
  def buildStairMjpegAvi(targets: Seq[Long], cell: Int = 8,
                         step: Int = 12,
                         quality: Float = 0.95f): Array[Byte] =
    Multimodal.buildMjpegAviFromJpegs(9 * cell, 8 * cell,
      targets.map(t => buildStairJpeg(t, cell, step, quality)))

  /** (id, frame_idx, fhash) for every decodable frame of every AVI in
    * `media` — one map-side pass. `frame_idx` is the CONTAINER position
    * (assigned before decode), so an undecodable frame leaves a gap
    * that [[nearDupPairsFromHashes]] detects and quarantines instead of
    * comparing misaligned.
    */
  def frameHashes(media: Dataset[MediaFile]): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.flatMap { m =>
      Multimodal.mjpegFrameBytes(m.bytes).iterator.zipWithIndex.flatMap {
        case (jpg, i) => ImageHash.dHash64(jpg).map(h => (m.id, i, h))
      }
    }.toDF("id", "frame_idx", "fhash")
  }

  /** Near-duplicate video pairs (id_a < id_b, same frame count, summed
    * per-frame Hamming ≤ maxTotalHamming) via the frame-aligned banded
    * join: videos decode exactly once (pinned frame hashes), candidate
    * id pairs dedup BEFORE signatures join back, and the exact verify
    * is one zip_with/aggregate over the two frame-hash arrays. Emits
    * (id_a, id_b, n_frames, hamming).
    */
  def videoNearDupPairs(media: Dataset[MediaFile],
                        maxTotalHamming: Int): DataFrame =
    nearDupPairsFromHashes(Pin.pin(frameHashes(media)), maxTotalHamming)

  /** [[videoNearDupPairs]] from an already-derived (and pinned)
    * frame-hash table — callers that also audit the hashes (the gate's
    * roundtrip contract) decode each video exactly once. Videos whose
    * decoded frame indices are not the dense prefix 0..n-1 (an
    * undecodable MID-stream frame) are EXCLUDED from pairing rather
    * than compared positionally misaligned: with a gap, two videos can
    * drop the same NUMBER of frames at different indices, pass the
    * equal-length guard, and zip_with would compare frame i of one
    * against frame j of the other — a quarantine case, not a pair.
    */
  def nearDupPairsFromHashes(hashed: DataFrame,
                             maxTotalHamming: Int): DataFrame = {
    Hamming.requireGuaranteedRadius(maxTotalHamming,
      "videoNearDupPairs")
    val sigs = hashed
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("frame_idx"),
        col("fhash")))).as("fs"),
        max(col("frame_idx")).as("mx"))
      .filter(col("mx") + 1 === size(col("fs"))) // dense prefix only
      .select(col("id"),
        expr("transform(fs, f -> f.fhash)").as("sig"),
        size(col("fs")).as("nf"))
    val bandRows = Hamming.bandRows(
      hashed.select(col("id"), col("frame_idx"), col("fhash")),
      "fhash")
    val cands = bandRows
      .select(col("id").as("id_a"), col("frame_idx"), col("b"), col("v"))
      .join(bandRows.select(col("id").as("id_b"), col("frame_idx"),
        col("b"), col("v")), Seq("frame_idx", "b", "v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cands
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sa"),
        col("nf").as("na")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sb"),
        col("nf").as("nb")), "id_b")
      .filter(col("na") === col("nb"))
      .withColumn("hamming",
        expr("aggregate(zip_with(sa, sb, (x, y) -> bit_count(x ^ y)), " +
          "0L, (acc, d) -> acc + d)"))
      .filter(col("hamming") <= maxTotalHamming)
      .select(col("id_a"), col("id_b"),
        col("na").cast("long").as("n_frames"), col("hamming"))
  }
}
