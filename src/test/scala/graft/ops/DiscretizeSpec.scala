package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class DiscretizeSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "Discretize.equalWidth"

  private def bins(vals: Seq[Double], nBins: Int, lo: Double,
                   hi: Double): Seq[Long] = {
    val s = spark
    import s.implicits._
    Discretize.equalWidth(vals.toDF("x"), "x", "bin", nBins, lo, hi)
      .collect().map(_.getLong(1)).toSeq
  }

  it should "bin uniformly over the range and clamp the max into the top bin" in {
    bins(Seq(0.0, 0.99, 1.0, 5.0, 9.99, 10.0), 10, 0.0, 10.0) shouldBe
      Seq(0L, 0L, 1L, 5L, 9L, 9L)
  }

  it should "clamp out-of-range values into the edge bins" in {
    bins(Seq(-3.0, 42.0), 10, 0.0, 10.0) shouldBe Seq(0L, 9L)
  }

  it should "put everything in bin 0 on a degenerate range" in {
    bins(Seq(7.0, 7.0, 7.0), 10, 7.0, 7.0) shouldBe Seq(0L, 0L, 0L)
  }

  behavior of "Discretize.equalWidthAuto"

  it should "take the range from the column's exact min/max" in {
    val s = spark
    import s.implicits._
    val out = Discretize.equalWidthAuto(
      Seq(2.0, 3.0, 4.0, 5.0, 6.0).toDF("x"), "x", "bin", 4)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    // width = (6-2)/4 = 1: [2,3) -> 0, [3,4) -> 1, [4,5) -> 2, [5,6] -> 3
    out shouldBe Map(2.0 -> 0L, 3.0 -> 1L, 4.0 -> 2L, 5.0 -> 3L, 6.0 -> 3L)
  }
}
