package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Hamming-banded candidate join shared by every fixed-width
  * perceptual-hash dedup operator (image dHash, audio energy-envelope
  * fingerprint, per-frame video signatures): split each 64-bit hash into
  * 8 bands of 8 bits, bucket on (band, value), verify candidates exactly
  * by popcount of the XOR. By pigeonhole a pair within Hamming distance
  * ≤ 7 differs in at most 7 bands, so it SHARES at least one — recall at
  * `maxHamming ≤ 7` is guaranteed, not probabilistic, and the shuffle is
  * Σ bucket², never corpus² (the LSH-band discipline of
  * [[Dedup.minHashPairs]]).
  */
object Hamming {

  /** Bands per 64-bit hash (8 × 8 bits): full recall up to distance 7. */
  val NumBands = 8

  /** Fail loudly when a caller asks for a radius the 8×8 banding cannot
    * guarantee recall for — silently losing recall is the one failure
    * mode a dedup pipeline cannot observe from its output.
    */
  def requireGuaranteedRadius(maxHamming: Int, op: String): Unit =
    require(maxHamming >= 0 && maxHamming <= NumBands - 1,
      s"$op: maxHamming=$maxHamming outside the banded join's " +
        s"guaranteed-recall range 0..${NumBands - 1} ($NumBands bands " +
        "of 8 bits); raise NumBands deliberately for a looser radius")

  /** `hashed` exploded to one row per (input columns, band, band
    * value) — the bucket key side of the candidate join. Non-hash
    * columns (e.g. a frame index) pass through and become part of the
    * bucket key at the caller's join.
    */
  def bandRows(hashed: DataFrame, hashCol: String): DataFrame =
    hashed.select(col("*"),
      explode(sequence(lit(0), lit(NumBands - 1))).as("b"))
      .withColumn("v", expr(s"($hashCol >> (b * 8)) & 255"))

  /** Near-duplicate pairs (id_a < id_b, hamming ≤ maxHamming) of a
    * 64-bit-hash table `hashed` (`idCol`, `hashCol`): banded candidates,
    * deduped BEFORE the popcount verify. The input is pinned by the
    * caller if deriving a hash row is expensive (e.g. an image decode).
    */
  def bandedPairs(hashed: DataFrame, idCol: String, hashCol: String,
                  maxHamming: Int, op: String): DataFrame = {
    requireGuaranteedRadius(maxHamming, op)
    val rows = bandRows(
      hashed.select(col(idCol).as("id"), col(hashCol).as("hash")),
      "hash")
    val a = rows.select(col("id").as("id_a"), col("hash").as("ha"),
      col("b"), col("v"))
    val bside = rows.select(col("id").as("id_b"), col("hash").as("hb"),
      col("b"), col("v"))
    a.join(bside, Seq("b", "v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ha", "hb").distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
