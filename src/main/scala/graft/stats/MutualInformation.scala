package graft.stats

import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector}

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
    * Only indices where a(i) != 0 or b(i) != 0 are visited; the (0,0) count
    * is inferred. Equivalent to a full dense contingency build.
    */
  def fromVectors(a: Vector, b: Vector): Double = {
    require(a.size == b.size,
      s"vectors must have equal length (${a.size} != ${b.size})")
    val cxy = mutable.Map.empty[(Double, Double), Long]
    var touched = 0L
    def visit(i: Int): Unit = {
      val av = a(i); val bv = b(i)
      cxy.updateWith((av, bv))(v => Some(v.getOrElse(0L) + 1L))
      touched += 1
    }
    // Union of non-zero index sets, each index visited exactly once.
    val seen = new java.util.BitSet(a.size)
    def activeNonZero(v: Vector)(f: Int => Unit): Unit = v match {
      case d: DenseVector =>
        var i = 0
        while (i < d.size) { if (d.values(i) != 0.0) f(i); i += 1 }
      case s: SparseVector =>
        var i = 0
        while (i < s.indices.length) {
          if (s.values(i) != 0.0) f(s.indices(i)); i += 1
        }
    }
    activeNonZero(a) { i => if (!seen.get(i)) { seen.set(i); visit(i) } }
    activeNonZero(b) { i => if (!seen.get(i)) { seen.set(i); visit(i) } }
    val zz = a.size - touched
    if (zz > 0) cxy.updateWith((0.0, 0.0))(v => Some(v.getOrElse(0L) + zz))
    fromPairCounts(cxy.iterator.map { case ((x, y), c) => (x, y, c) }.toSeq)
  }
}
