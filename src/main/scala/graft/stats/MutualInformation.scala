package graft.stats

import org.apache.spark.ml.linalg.Vector

import scala.collection.mutable

/** Mutual information between two categorical variables, in nats.
  *
  * Semantics match the reference engine (see SURVEY.md §2 O4/O5, citing
  * `reference:src/main/scala/ifs/ml/stats/MutualInformation.scala:19-77`):
  *   - natural log (nats), `MI = Σ pxy · ln(pxy / (px·py))`
  *   - zero-count cells are skipped (the `pxy > 0` guard)
  *   - the vector form is sparse-aware: only positions where at least one of
  *     the two vectors is non-zero are touched; the (0,0) cell count is
  *     inferred as `size − touched` without iterating the zero-zero mass.
  *
  * Values are treated as exact categorical levels (`==` grouping) — never as
  * ordered quantities. Discretization is the caller's job.
  */
object MutualInformation {

  /** MI from co-occurrence counts given as (levelX, levelY, count) triples.
    * Triples with the same (x, y) key are summed. Runs driver- or
    * executor-local; inputs are bounded by the engine's maxCategories guard.
    */
  def fromPairCounts[X, Y](counts: Iterable[(X, Y, Long)]): Double = {
    val cxy = mutable.Map.empty[(X, Y), Long]
    counts.foreach { case (x, y, c) =>
      if (c != 0L) cxy.updateWith((x, y))(v => Some(v.getOrElse(0L) + c))
    }
    val n = cxy.valuesIterator.sum.toDouble
    if (n == 0.0) return 0.0
    val cx = mutable.Map.empty[X, Long]
    val cy = mutable.Map.empty[Y, Long]
    cxy.foreach { case ((x, y), c) =>
      cx.updateWith(x)(v => Some(v.getOrElse(0L) + c))
      cy.updateWith(y)(v => Some(v.getOrElse(0L) + c))
    }
    var mi = 0.0
    cxy.foreach { case ((x, y), c) =>
      if (c > 0L) {
        val pxy = c / n
        mi += pxy * math.log(pxy / ((cx(x) / n) * (cy(y) / n)))
      }
    }
    mi
  }

  /** MI from a dense contingency matrix `m(i)(j) = count(x=i, y=j)`. */
  def fromContingency(m: Array[Array[Long]]): Double =
    fromPairCounts(for {
      i <- m.indices
      j <- m(i).indices
    } yield (i, j, m(i)(j)))

  /** MI of two equal-length categorical vectors, sparse-aware.
    * Only indices where a(i) != 0 or b(i) != 0 contribute individually; the
    * (0,0) cell count is inferred as `size − touched`. Equivalent to a full
    * dense contingency build.
    *
    * Hot path of the alternate-encoding selection (runs once per candidate
    * per round on instance-length vectors), so it is allocation-free per
    * element: per-side level dictionaries and the pair-count table are
    * primitive open-addressed maps keyed on the raw double bit patterns —
    * ~20 ns/element instead of the ~µs of a boxed-tuple map.
    */
  def fromVectors(a: Vector, b: Vector): Double = {
    require(a.size == b.size,
      s"vectors must have equal length (${a.size} != ${b.size})")
    val n = a.size
    if (n == 0) return 0.0
    val da = a.toDense.values
    val db = b.toDense.values
    val dictA = new LongIntMap
    val dictB = new LongIntMap
    val counts = new LongLongMap
    var touched = 0L
    var i = 0
    while (i < n) {
      val av = da(i); val bv = db(i)
      if (av != 0.0 || bv != 0.0) {
        val ia = dictA.getOrInsert(java.lang.Double.doubleToLongBits(av))
        val ib = dictB.getOrInsert(java.lang.Double.doubleToLongBits(bv))
        counts.add((ia.toLong << 32) | ib.toLong, 1L)
        touched += 1
      }
      i += 1
    }
    val zz = n - touched
    if (zz > 0) {
      val zeroBits = java.lang.Double.doubleToLongBits(0.0)
      val ia = dictA.getOrInsert(zeroBits)
      val ib = dictB.getOrInsert(zeroBits)
      counts.add((ia.toLong << 32) | ib.toLong, zz)
    }
    // marginals, then Σ pxy·ln(pxy/(px·py)) — identical to fromPairCounts
    val cx = new Array[Long](dictA.size)
    val cy = new Array[Long](dictB.size)
    counts.foreachEntry { (k, c) =>
      cx((k >>> 32).toInt) += c
      cy((k & 0xffffffffL).toInt) += c
    }
    val nd = n.toDouble
    var mi = 0.0
    counts.foreachEntry { (k, c) =>
      if (c > 0L) {
        val pxy = c / nd
        mi += pxy * math.log(pxy / ((cx((k >>> 32).toInt) / nd) *
          (cy((k & 0xffffffffL).toInt) / nd)))
      }
    }
    mi
  }
}

/** Minimal open-addressed Long→Int map (linear probing, power-of-two
  * capacity). `getOrInsert` assigns dense ids 0..size-1 in first-seen
  * order. Not thread-safe; built for the MI hot loop.
  */
private[stats] final class LongIntMap(initialCapacity: Int = 32) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16)) * 2
  private var keys = new Array[Long](cap)
  private var vals = new Array[Int](cap)
  java.util.Arrays.fill(vals, -1)
  private var n = 0

  def size: Int = n

  private def slot(key: Long, ks: Array[Long], vs: Array[Int]): Int = {
    var h = key * -7046029254386353131L
    h ^= h >>> 32
    var p = (h & (ks.length - 1)).toInt
    while (vs(p) != -1 && ks(p) != key) p = (p + 1) & (ks.length - 1)
    p
  }

  def getOrInsert(key: Long): Int = {
    val p = slot(key, keys, vals)
    if (vals(p) != -1) return vals(p)
    keys(p) = key; vals(p) = n; n += 1
    if (n * 4 > cap * 3) grow()
    n - 1
  }

  private def grow(): Unit = {
    val nk = new Array[Long](cap * 2)
    val nv = new Array[Int](cap * 2)
    java.util.Arrays.fill(nv, -1)
    var i = 0
    while (i < cap) {
      if (vals(i) != -1) {
        val p = slot(keys(i), nk, nv)
        nk(p) = keys(i); nv(p) = vals(i)
      }
      i += 1
    }
    cap *= 2; keys = nk; vals = nv
  }
}

/** Minimal open-addressed Long→Long additive map (linear probing). */
private[stats] final class LongLongMap(initialCapacity: Int = 64) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16)) * 2
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  java.util.Arrays.fill(vals, -1L)
  private var n = 0

  private def slot(key: Long, ks: Array[Long], vs: Array[Long]): Int = {
    var h = key * -7046029254386353131L
    h ^= h >>> 32
    var p = (h & (ks.length - 1)).toInt
    while (vs(p) != -1L && ks(p) != key) p = (p + 1) & (ks.length - 1)
    p
  }

  def add(key: Long, by: Long): Unit = {
    val p = slot(key, keys, vals)
    if (vals(p) == -1L) {
      keys(p) = key; vals(p) = by; n += 1
      if (n * 4 > cap * 3) grow()
    } else vals(p) += by
  }

  def foreachEntry(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (vals(i) != -1L) f(keys(i), vals(i))
      i += 1
    }
  }

  private def grow(): Unit = {
    val nk = new Array[Long](cap * 2)
    val nv = new Array[Long](cap * 2)
    java.util.Arrays.fill(nv, -1L)
    var i = 0
    while (i < cap) {
      if (vals(i) != -1L) {
        val p = slot(keys(i), nk, nv)
        nk(p) = keys(i); nv(p) = vals(i)
      }
      i += 1
    }
    cap *= 2; keys = nk; vals = nv
  }
}
