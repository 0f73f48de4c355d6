package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact distributed order statistics WITHOUT a global sort, a range
  * shuffle, or a sampling pass — iterative histogram refinement.
  *
  * The standard exact spellings all move or order the full multiset:
  * `Window.orderBy` funnels everything through one task,
  * `repartitionByRange` pays a sampling pass plus a full shuffle plus a
  * per-partition sort (the [[PrefixSum]] machinery — right when the
  * cumulated frame itself is the product, overkill when only a handful
  * of order statistics are). This operator instead narrows in on each
  * requested rank with map-side-only passes:
  *
  *   1. one aggregation for (min, max, count);
  *   2. per refinement level, ONE scan that buckets the current
  *      interval into ≤ `buckets` equal-width cells and counts each —
  *      a map-side hash aggregate of ≤ `buckets` cells, shuffling
  *      `buckets × partitions` rows at most, never the data;
  *   3. once a target cell's count is ≤ `cap`, one final scan collects
  *      that cell's DISTINCT values + counts (≤ cap rows by the count
  *      bound) and the exact rank is read off the cumulative walk.
  *
  * Cells that stay heavier than `cap` recurse (each level divides the
  * interval by `buckets`, so depth is ≤ log_buckets of the value range /
  * ulp); an interval too narrow to split (floating-point width 0) holds
  * ≤ 2 distinct doubles and resolves by the final collect regardless of
  * its count — massive ties cost nothing because the collect is by
  * DISTINCT value. The input plan is re-evaluated once per pass, which
  * is the design point: callers hand in a CHEAP plan (a broadcast
  * nested-loop pair generator, a pinned frame) and pay no
  * materialization at all. Driver memory is O(buckets + cap); executor
  * memory is the hash-aggregate's cells. Bucket assignment uses the
  * same floating-point expression for counting and for the recursion
  * filter, so boundary values cannot migrate between passes.
  *
  * Determinism: min/max/count and every histogram are
  * partition-order-free aggregations, so repeated runs over the same
  * data return bit-identical statistics.
  */
object RankSelect {

  /** Exact 1-based order statistics over `df(valueCol)` (cast to
    * double; must be non-null and non-NaN — NaN would poison bucket
    * arithmetic silently, so it raises). Returns rank → value for each
    * requested rank; use [[medianWithCount]] when n is also needed.
    */
  def orderStats(df: DataFrame, valueCol: String, ranks: Seq[Long],
                 buckets: Int = 4096, cap: Int = 65536)
  : Map[Long, Double] = {
    require(ranks.nonEmpty, "ranks must be non-empty")
    val (v, lo, hi, n) = headStats(df, valueCol)
    ranks.foreach(r => require(r >= 1 && r <= n,
      s"rank $r out of range 1..$n"))
    resolve(v, lit(true), lo, hi, 0L, ranks.distinct.sorted, buckets, cap)
  }

  /** The exact median (mean of the two middle order statistics — equal
    * for odd n) plus the total count, in ≤ 3 passes for well-spread
    * data (head stats, one histogram level, one cell collect).
    */
  def medianWithCount(df: DataFrame, valueCol: String,
                      buckets: Int = 4096, cap: Int = 65536)
  : (Double, Long) = {
    val (v, lo, hi, n) = headStats(df, valueCol)
    require(n > 0, "median of an empty frame")
    val ranks = Seq((n + 1) / 2, (n + 2) / 2).distinct
    val stats = resolve(v, lit(true), lo, hi, 0L, ranks, buckets, cap)
    ((stats((n + 1) / 2) + stats((n + 2) / 2)) / 2.0, n)
  }

  /** One aggregation pass: the projected value frame plus its (min,
    * max, count), with the NULL/NaN fail-fast.
    */
  private def headStats(df: DataFrame, valueCol: String)
  : (DataFrame, Double, Double, Long) = {
    val v = df.select(col(valueCol).cast("double").as("v"))
    val head = v.agg(
      min(col("v")).as("lo"), max(col("v")).as("hi"),
      count(lit(1)).as("n"),
      sum(when(col("v").isNull || isnan(col("v")), 1L)
        .otherwise(0L)).as("bad")).head()
    require(head.getLong(3) == 0L,
      s"RankSelect: $valueCol contains NULL or NaN values — order " +
        "statistics are defined over finite values only")
    val n = head.getLong(2)
    (v, if (n == 0) 0.0 else head.getDouble(0),
      if (n == 0) 0.0 else head.getDouble(1), n)
  }

  /** Resolve `ranks` (global 1-based, sorted) among the values matching
    * `pred` within [lo, hi]; `offset` = count of values preceding the
    * predicate's range in the global order.
    */
  private def resolve(v: DataFrame, pred: Column, lo: Double, hi: Double,
                      offset: Long, ranks: Seq[Long],
                      buckets: Int, cap: Int): Map[Long, Double] = {
    if (lo == hi) return ranks.map(_ -> lo).toMap
    val w = (hi - lo) / buckets
    // A bucket width the addition can't resolve (lo + w == lo) means the
    // histogram cannot split further — but it only bounds w below
    // ulp(lo)/2, so [lo, hi] can still span up to ~buckets/2 ulps and
    // that many distinct doubles, NOT "at most two" (ADVICE r11 #4).
    // Bound the final collect by the interval's EXACT representable-
    // double count (the ordinal distance of the IEEE bit patterns),
    // clamped at 2^20 so the driver bound stays explicit: a narrower-
    // than-ulp interval holding over a million representable doubles is
    // only reachable through a denormal-crossing range, where the clear
    // collectCell error beats an unbounded collect.
    if (w == 0.0 || lo + w == lo) {
      val span = ulpSpan(lo, hi)
      return collectCell(v, pred, ranks, offset,
        math.min(math.max(span, cap.toLong), 1L << 20).toInt)
    }
    val idx = least(greatest(
      floor((col("v") - lit(lo)) / lit(w)), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("int")
    // The refinement predicate rides INSIDE the grouping key (rows
    // outside the current cell chain collapse into one null group,
    // dropped on the driver) instead of a Filter node. This is
    // correctness, not style: Catalyst pushes every deterministic
    // filter conjunct below the value projection and into the CALLER's
    // join condition, where it can be ordered AHEAD of the join's own
    // condition — under ANSI mode that evaluates the value expression
    // on rows the join would have rejected (measured: q_theil_sen's
    // pairwise-slope division raised DIVIDE_BY_ZERO on phantom
    // d1 == d2 pairs). Predicate fences do not survive the optimizer
    // (rand() >= -1 folds via Rand's known bounds;
    // SimplifyConditionalsInPredicate un-CASEs conditional wrappers),
    // but a grouping/projection EXPRESSION is never pushed into a join
    // condition, so the division only ever runs on join survivors.
    val cells = v
      .groupBy(when(pred, idx).as("i")).agg(count(lit(1)).as("c"))
      .collect()
      .flatMap(r => if (r.isNullAt(0)) None
        else Some((r.getInt(0), r.getLong(1))))
      .sortBy(_._1)
    var cum = offset
    val spans = cells.map { case (i, c) =>
      val s = (i, c, cum + 1, cum + c); cum += c; s
    }
    ranks.groupBy(r => spans.find(s => r >= s._3 && r <= s._4).getOrElse(
        throw new IllegalStateException(
          s"rank $r not covered — concurrent input mutation?")))
      .flatMap { case ((i, c, start, _), rs) =>
        val cellPred = pred && idx === i
        val cellLo = math.max(lo, lo + i * w)
        val cellHi = math.min(hi, lo + (i + 1) * w)
        val before = start - 1 // values preceding this cell globally
        if (c <= cap) collectCell(v, cellPred, rs, before, cap)
        else resolve(v, cellPred, cellLo, cellHi, before, rs, buckets, cap)
      }
  }

  /** Exact count of representable doubles in [lo, hi]: the ordinal
    * distance of the IEEE-754 bit patterns (sign-folded so the mapping
    * is monotone across zero), plus one for the closed interval.
    */
  private def ulpSpan(lo: Double, hi: Double): Long = {
    def ord(d: Double): Long = {
      val b = java.lang.Double.doubleToLongBits(d)
      if (b >= 0L) b else Long.MinValue - b
    }
    ord(hi) - ord(lo) + 1
  }

  /** Final pass: the target cell's distinct values + counts, walked
    * cumulatively on the driver. The limit makes the driver bound
    * explicit; callers only reach here when the cell's ROW count (an
    * upper bound on its distinct count) is ≤ cap, or when the interval
    * is too narrow to split (cap then = its representable-double span).
    */
  private def collectCell(v: DataFrame, pred: Column, ranks: Seq[Long],
                          offset: Long, cap: Int): Map[Long, Double] = {
    // Same keyed-refinement shape as the histogram pass (see resolve):
    // the predicate lives in the grouping key, never in a pushable
    // Filter; the single null group (rows outside the cell) sorts
    // first and is dropped on the driver.
    val vals = v
      .groupBy(when(pred, col("v")).as("v")).agg(count(lit(1)).as("c"))
      .orderBy(col("v").asc_nulls_first).limit(cap + 3).collect()
      .filter(!_.isNullAt(0))
    var cum = offset
    val walked = vals.map { r =>
      val span = (r.getDouble(0), cum + 1, cum + r.getLong(1))
      cum = span._3; span
    }
    ranks.map { r =>
      r -> walked.find(s => r >= s._2 && r <= s._3).getOrElse(
        throw new IllegalStateException(
          s"rank $r beyond collected cell (cap $cap) — raise cap or " +
            "buckets"))._1
    }.toMap
  }
}
