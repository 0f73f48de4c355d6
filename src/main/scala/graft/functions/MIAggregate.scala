package graft.functions

import graft.stats.MutualInformation
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Typed `Aggregator` computing the mutual information (nats) of a pair of
  * categorical columns — the SURVEY.md §7.4 "contingency aggregation as a
  * custom aggregate" realized: pair counts accumulate MAP-SIDE into the
  * aggregation buffer (partial aggregation bounds the shuffle by distinct
  * levels², not rows — the same property the explode→groupBy MI path gets
  * from Catalyst, here packaged as a reusable group-aware aggregate), and
  * the tiny count map folds to one double per group in `finish`.
  *
  * Usable anywhere an aggregate goes: `df.groupBy(g).agg(MIAggregate.mi(x,
  * y))` — grouped MI was impossible in the reference (one global matrix
  * per job, `reference:IterativeFeatureSelection.scala:97`).
  */
object MIAggregate {

  // ---- flat open-addressed pair-count table -------------------------------
  //
  // The buffer is a plain Array[Long] (natively encoded — ArrayType(Long),
  // no Kryo): an open-addressed hash table of 3-long slots
  // [xBits, yBits, count], count == 0 marking an empty slot (real counts are
  // always ≥ 1). Levels are keyed on the raw `doubleToLongBits` patterns —
  // exact 128-bit keys, no string building, no boxing. `reduce`/`merge`
  // mutate the array in place and return it (the documented Aggregator
  // fast path; ObjectHashAggregate keeps the live buffer as an object and
  // only encodes on spill/shuffle), so the per-row cost is one hash probe —
  // the same primitive-encoding idea as graft.stats.LongIntMap, flattened
  // into an encodable array. Capacity is bounded by distinct level pairs
  // (the engine's maxCategories guard), never by row count.

  private final val SlotSize = 3
  private final val InitialSlots = 16 // power of two
  // Array index 0 holds the occupied-slot count so the 3/4-load check is
  // O(1) per insertion (a full-table rescan per new key would make k
  // distinct-pair ingestion O(k²)); slots start at index `Header`.
  private final val Header = 1

  private def hashSlot(xBits: Long, yBits: Long, nSlots: Int): Int = {
    var h = xBits * -7046029254386353131L
    h ^= (h >>> 32)
    h ^= yBits * 0x9e3779b97f4a7c15L
    h ^= (h >>> 29)
    (h & (nSlots - 1)).toInt
  }

  /** Add `c` to the (xBits, yBits) cell, growing if needed; returns the
    * (possibly reallocated) table.
    */
  private def add(t0: Array[Long], xBits: Long, yBits: Long,
                  c: Long): Array[Long] = {
    var t = if (t0.length == 0)
              new Array[Long](Header + InitialSlots * SlotSize)
            else t0
    val nSlots = (t.length - Header) / SlotSize
    var s = hashSlot(xBits, yBits, nSlots)
    var probes = 0
    while (true) {
      val base = Header + s * SlotSize
      if (t(base + 2) == 0L) {
        // empty: claim it, growing first if past 3/4 load
        if ((t(0) + 1) * 4 > nSlots * 3) {
          t = grow(t)
          return add(t, xBits, yBits, c)
        }
        t(base) = xBits; t(base + 1) = yBits; t(base + 2) = c
        t(0) += 1
        return t
      }
      if (t(base) == xBits && t(base + 1) == yBits) {
        t(base + 2) += c
        return t
      }
      s = (s + 1) & (nSlots - 1)
      probes += 1
      require(probes <= nSlots, "MIAggregate: hash table full") // unreachable
    }
    t // unreachable
  }

  private def grow(t: Array[Long]): Array[Long] = {
    var nt = new Array[Long](Header + (t.length - Header) * 2)
    var i = Header
    while (i < t.length) {
      if (t(i + 2) != 0L) nt = add(nt, t(i), t(i + 1), t(i + 2))
      i += SlotSize
    }
    nt
  }

  /** Inputs are boxed so a NULL in either column is representable: a null
    * pair contributes nothing (SQL-aggregate convention — `corr`, `covar`
    * etc. likewise skip rows with any null operand) instead of failing the
    * whole aggregation with a non-nullable-field encoder error.
    */
  val aggregator: Aggregator[(java.lang.Double, java.lang.Double),
      Array[Long], Double] =
    new Aggregator[(java.lang.Double, java.lang.Double),
        Array[Long], Double] {
      override def zero: Array[Long] = Array.emptyLongArray

      override def reduce(b: Array[Long],
          a: (java.lang.Double, java.lang.Double)): Array[Long] = {
        if (a._1 == null || a._2 == null) b
        else add(b,
          java.lang.Double.doubleToLongBits(a._1.doubleValue),
          java.lang.Double.doubleToLongBits(a._2.doubleValue), 1L)
      }

      override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
        // fold the smaller table into the larger one
        val (small, large) = if (b1.length < b2.length) (b1, b2) else (b2, b1)
        var acc = large
        var i = Header
        while (i < small.length) {
          if (small(i + 2) != 0L)
            acc = add(acc, small(i), small(i + 1), small(i + 2))
          i += SlotSize
        }
        acc
      }

      override def finish(b: Array[Long]): Double = {
        val triples = Seq.newBuilder[(Double, Double, Long)]
        var i = Header
        while (i < b.length) {
          if (b(i + 2) != 0L)
            triples += ((java.lang.Double.longBitsToDouble(b(i)),
              java.lang.Double.longBitsToDouble(b(i + 1)), b(i + 2)))
          i += SlotSize
        }
        MutualInformation.fromPairCounts(triples.result())
      }

      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form: `mi(x, y)` as an aggregate expression; null-skipping. */
  def mi(x: Column, y: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(aggregator, Encoders.tuple(Encoders.DOUBLE, Encoders.DOUBLE))
      .apply(x.cast("double"), y.cast("double"))
  }
}
