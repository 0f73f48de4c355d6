package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Count-Min sketch as a typed `Aggregator` — the mergeable
  * frequency-sketch sibling of the HLL distinct sketch already in the
  * gate (`q_hll_users`): approximate per-key counts over an unbounded
  * key space in CONSTANT space. At 100 TB an exact token-frequency table
  * shuffles |vocab| rows; the sketch accumulates map-side into a fixed
  * `Depth`×`Width` long grid (32 KB here) and the shuffle carries one
  * grid per partition, independent of both row count and vocabulary.
  *
  * Standard CMS guarantees (Cormode & Muthukrishnan 2005): estimates
  * never undercount, and overcount by more than (e/Width)·N with
  * probability ≤ exp(−Depth) per query. The gate checks a relaxed
  * integer-exact form of that bound (see `q_cms_counts`).
  *
  * Hashing is a seeded FNV-1a variant — deterministic across JVMs and
  * sessions (no `Object.hashCode`), so sketch contents are reproducible
  * and the gate's booleans can be hash-compared.
  */
object CountMin {

  val Depth = 4
  val Width = 1024 // power of two

  /** Bucket of `s` in sketch row `row` (0-based). */
  def bucket(s: String, row: Int): Int = {
    var h = 0x9e3779b97f4a7c15L * (row + 1)
    var i = 0
    while (i < s.length) {
      h = (h ^ s.charAt(i).toLong) * 0x100000001b3L
      i += 1
    }
    h ^= (h >>> 33)
    (h & (Width - 1)).toInt
  }

  /** Point estimate: min over the key's `Depth` counters. */
  def estimate(sketch: Array[Long], s: String): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = sketch(r * Width + bucket(s, r))
      if (c < min) min = c
      r += 1
    }
    min
  }

  /** Total ingested count — every row of the grid sums to N. */
  def total(sketch: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < Width) { n += sketch(i); i += 1 }
    n
  }

  val aggregator: Aggregator[String, Array[Long], Array[Long]] =
    new Aggregator[String, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](Depth * Width)

      override def reduce(b: Array[Long], a: String): Array[Long] = {
        if (a != null) {
          var r = 0
          while (r < Depth) { b(r * Width + bucket(a, r)) += 1; r += 1 }
        }
        b
      }

      override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var i = 0
        while (i < x.length) { x(i) += y(i); i += 1 }
        x
      }

      override def finish(b: Array[Long]): Array[Long] = b

      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** Column form: `sketch(key)` aggregates to the Depth×Width grid
    * (row-major `array<bigint>`); null keys skipped.
    */
  def sketch(key: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(aggregator, Encoders.STRING).apply(key.cast("string"))
  }
}
