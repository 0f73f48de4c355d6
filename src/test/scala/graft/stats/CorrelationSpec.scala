package graft.stats

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class CorrelationSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "Correlation.pairwiseCorr"

  it should "match the naive Pearson formula on a known sample" in {
    val s = spark
    import s.implicits._
    val data = Seq((1.0, 2.0, 5.0), (2.0, 4.1, 4.0), (3.0, 5.9, 3.0),
      (4.0, 8.2, 2.0), (5.0, 9.8, 1.0))
    val out = Correlation
      .pairwiseCorr(data.toDF("a", "b", "c"), Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSeq
    def naive(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.size
      val mx = x.sum / n; val my = y.sum / n
      val cov = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = x.map(a => (a - mx) * (a - mx)).sum
      val vy = y.map(b => (b - my) * (b - my)).sum
      cov / math.sqrt(vx * vy)
    }
    val a = data.map(_._1); val b = data.map(_._2); val c = data.map(_._3)
    out.map(_._1) shouldBe Seq("a", "a", "b")
    out.map(_._2) shouldBe Seq("b", "c", "c")
    out(0)._3 shouldBe naive(a, b) +- 1e-6
    out(1)._3 shouldBe naive(a, c) +- 1e-6
    out(2)._3 shouldBe naive(b, c) +- 1e-6
    out(1)._3 shouldBe -1.0 // c is an exact linear flip of a
  }

  it should "exclude rows with a NULL in any column (listwise)" in {
    val s = spark
    import s.implicits._
    val clean = Seq((1.0, 2.0, 5.0), (2.0, 4.1, 4.0), (3.0, 5.9, 3.0),
      (4.0, 8.2, 2.0), (5.0, 9.8, 1.0))
    val withNulls = clean.map { case (a, b, c) =>
      (Option(a), Option(b), Option(c))
    } ++ Seq((Some(9.0), None, Some(9.0)), (None, Some(1.0), None))
    val got = Correlation
      .pairwiseCorr(withNulls.toDF("a", "b", "c"), Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val want = Correlation
      .pairwiseCorr(clean.toDF("a", "b", "c"), Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got shouldBe want
  }

  it should "be invariant to partitioning (exact decimal sums)" in {
    val s = spark
    import s.implicits._
    val data = (1 to 500).map(i =>
      (i * 0.731 % 7, math.sin(i) * 3 + i * 0.01))
    val one = Correlation.pairwiseCorr(
      data.toDF("x", "y").repartition(1), Seq("x", "y"))
      .collect().map(_.getDouble(2)).toSeq
    val many = Correlation.pairwiseCorr(
      data.toDF("x", "y").repartition(7), Seq("x", "y"))
      .collect().map(_.getDouble(2)).toSeq
    one shouldBe many
  }
}
