package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.{broadcast, col}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import scala.util.Random

class RankSelectSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def df(xs: Seq[Double]) = {
    import spark.implicits._
    xs.toDF("x")
  }

  behavior of "RankSelect.orderStats"

  it should "match a driver-side sort on random data with duplicates" in {
    val rnd = new Random(42)
    val xs = Seq.fill(5000)(rnd.nextInt(300).toDouble / 7.0)
    val sorted = xs.sorted
    val ranks = Seq(1L, 2L, 777L, 2500L, 2501L, 4999L, 5000L)
    val got = RankSelect.orderStats(df(xs), "x", ranks)
    ranks.foreach(r => got(r) shouldBe sorted(r.toInt - 1))
  }

  it should "stay exact when the cap forces recursion" in {
    val rnd = new Random(7)
    val xs = Seq.fill(2000)(rnd.nextDouble() * 100 - 50)
    val sorted = xs.sorted
    val ranks = Seq(1L, 1000L, 1001L, 2000L)
    // buckets small and cap far below n: every level recurses
    val got = RankSelect.orderStats(df(xs), "x", ranks,
      buckets = 8, cap = 16)
    ranks.foreach(r => got(r) shouldBe sorted(r.toInt - 1))
  }

  it should "resolve massive ties without collecting rows (distinct " +
    "values bound the collect, not row counts)" in {
    // two spikes, each far heavier than the cap — the ulp-narrow
    // interval path must resolve them via the distinct-value collect
    val xs = Seq.fill(3000)(0.25) ++ Seq.fill(5000)(0.75)
    val got = RankSelect.orderStats(df(xs), "x",
      Seq(1L, 3000L, 3001L, 8000L), cap = 10)
    got(1L) shouldBe 0.25
    got(3000L) shouldBe 0.25
    got(3001L) shouldBe 0.75
    got(8000L) shouldBe 0.75
  }

  it should "handle an all-equal frame and a single row" in {
    RankSelect.orderStats(df(Seq.fill(100)(3.14)), "x",
      Seq(1L, 50L, 100L)).values.toSet shouldBe Set(3.14)
    RankSelect.orderStats(df(Seq(42.0)), "x", Seq(1L)) shouldBe
      Map(1L -> 42.0)
  }

  it should "raise on NaN and on out-of-range ranks" in {
    an[Exception] should be thrownBy
      RankSelect.orderStats(df(Seq(1.0, Double.NaN)), "x", Seq(1L))
    an[Exception] should be thrownBy
      RankSelect.orderStats(df(Seq(1.0, 2.0)), "x", Seq(3L))
    an[Exception] should be thrownBy
      RankSelect.orderStats(df(Seq(1.0, 2.0)), "x", Seq(0L))
  }

  behavior of "RankSelect.medianWithCount"

  it should "match the sorted median for odd and even n" in {
    val rnd = new Random(11)
    val odd = Seq.fill(701)(rnd.nextInt(50).toDouble)
    val even = Seq.fill(700)(rnd.nextInt(50).toDouble)
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = xs.length
      (s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)) / 2.0
    }
    RankSelect.medianWithCount(df(odd), "x") shouldBe ((med(odd), 701L))
    RankSelect.medianWithCount(df(even), "x") shouldBe ((med(even), 700L))
  }

  it should "not push refinement predicates into the caller's plan " +
    "(the ANSI phantom-evaluation hazard)" in {
    // the value is a division guarded ONLY by the join condition
    // (x1 < x2 → divisor ≥ 1): if a histogram-cell predicate were
    // pushed into the join it can be reordered AHEAD of that condition
    // and divide by zero on phantom x1 == x2 pairs under ANSI mode —
    // exactly how q_theil_sen failed before the noPush guard.
    import spark.implicits._
    val t = (1 to 300).map(i => (i.toLong, (i * 13 % 97).toLong))
      .toDF("x", "y")
    val a = t.select(col("x").as("x1"), col("y").as("y1"))
    val b = t.select(col("x").as("x2"), col("y").as("y2"))
    val slopes = a.join(broadcast(b), col("x1") < col("x2"))
      .select(((col("y2") - col("y1")).cast("double") /
        (col("x2") - col("x1")).cast("double")).as("s"))
    val n = 300L * 299L / 2L
    val got = RankSelect.orderStats(slopes, "s",
      Seq(1L, (n + 1) / 2, n), cap = 64)
    val sorted = slopes.collect().map(_.getDouble(0)).sorted
    got(1L) shouldBe sorted.head
    got((n + 1) / 2) shouldBe sorted(((n + 1) / 2).toInt - 1)
    got(n) shouldBe sorted.last
  }

  it should "shuffle only histogram cells, never the data" in {
    // plan contract: no pass moves the multiset — the only shuffles in
    // any job RankSelect runs are the ≤buckets-cell aggregations, so a
    // scan of the input must never feed an exchange wider than the
    // bucket count. Verified indirectly: a 100k-row frame resolves with
    // tiny driver caps and never materializes (no OOM, exact answer).
    val rnd = new Random(3)
    val xs = Seq.fill(100000)(rnd.nextGaussian())
    val sorted = xs.sorted
    val (m, n) = RankSelect.medianWithCount(df(xs), "x", cap = 128)
    n shouldBe 100000L
    m shouldBe (sorted(49999) + sorted(50000)) / 2.0
  }
}
