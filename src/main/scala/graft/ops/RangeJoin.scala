package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range (interval) join — the missing-from-Spark operator for
  * "left row ⋈ right rows whose timestamp falls in [leftTs + lo, leftTs +
  * hi]". The naive spelling is an equi-join on the entity key with the
  * range as a post-join filter, which degenerates into a per-key cross
  * product (a hot user with v views and b buys costs v·b pairs *before*
  * the filter). Banding bounds that: both sides are bucketed into
  * fixed-width time bands of width = the range span, the left side
  * duplicates into the (at most 2) bands its window overlaps, and the join
  * becomes an equi-join on (key, band) — each left row only ever meets
  * right rows within its window's bands, so pre-filter pairs are
  * proportional to actual temporal locality, not per-key row products.
  * This is the standard interval-join layout in stream processors (e.g.
  * Flink's interval join buckets state by time span) re-expressed as a
  * relational plan Catalyst can shuffle-hash: at 100 TB both sides
  * shuffle once on (key, band) and AQE handles residual band skew.
  *
  * Exact semantics (the band equi-join is a superset, then filtered):
  * rows (l, r) with `l.leftKey = r.rightKey` and `r.rightTsUs ∈
  * [l.leftTsUs + loUs, l.leftTsUs + hiUs]`. Key/timestamp column names
  * must be distinct across the two sides. Timestamps are integral
  * microseconds (the engine's event-time convention).
  */
object RangeJoin {

  def banded(left: DataFrame, right: DataFrame, leftKey: String,
             rightKey: String, leftTsUs: String, rightTsUs: String,
             loUs: Long, hiUs: Long): DataFrame = {
    require(hiUs >= loUs, s"empty range: [$loUs, $hiUs]")
    // Band width = range span ⇒ any left window overlaps ≤ 2 bands.
    val width = math.max(1L, hiUs - loUs + 1)
    val r = right.withColumn("__rband", floor(col(rightTsUs) / width))
    val l = left.withColumn("__lband",
      explode(sequence(floor((col(leftTsUs) + loUs) / width),
        floor((col(leftTsUs) + hiUs) / width))))
    // Key AND band both in the equi-join condition — the hash join
    // shuffles/probes on (key, band); only the exact range check is a
    // residual (non-equi) filter.
    l.join(r, col("__lband") === col("__rband") &&
        col(leftKey) === col(rightKey) &&
        col(rightTsUs) >= col(leftTsUs) + loUs &&
        col(rightTsUs) <= col(leftTsUs) + hiUs)
      .drop("__lband", "__rband")
  }
}
