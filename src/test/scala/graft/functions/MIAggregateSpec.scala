package graft.functions

import graft.SparkTestBase
import graft.stats.MutualInformation
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class MIAggregateSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "MIAggregate.mi"

  it should "match the pure vector MI on a null-free pair" in {
    val s = spark
    import s.implicits._
    val xs = Seq(0.0, 0.0, 1.0, 1.0, 2.0, 2.0)
    val ys = Seq(0.0, 0.0, 1.0, 1.0, 0.0, 1.0)
    val agg = xs.zip(ys).toDF("x", "y")
      .agg(MIAggregate.mi($"x", $"y").as("mi"))
      .head().getDouble(0)
    val expected = MutualInformation.fromPairCounts(
      xs.zip(ys).groupBy(identity).map { case ((x, y), g) =>
        (x, y, g.size.toLong)
      }.toSeq)
    agg shouldBe expected +- 1e-12
  }

  it should "skip rows where either side is null" in {
    val s = spark
    import s.implicits._
    val clean = Seq((0.0, 0.0), (0.0, 0.0), (1.0, 1.0), (1.0, 0.0))
    val withNulls: Seq[(java.lang.Double, java.lang.Double)] =
      clean.map { case (x, y) =>
        (java.lang.Double.valueOf(x), java.lang.Double.valueOf(y))
      } ++ Seq((null: java.lang.Double, java.lang.Double.valueOf(9.0)),
        (java.lang.Double.valueOf(9.0), null: java.lang.Double),
        (null: java.lang.Double, null: java.lang.Double))
    val expected = clean.toDF("x", "y")
      .agg(MIAggregate.mi($"x", $"y")).head().getDouble(0)
    val actual = withNulls.toDF("x", "y")
      .agg(MIAggregate.mi($"x", $"y")).head().getDouble(0)
    actual shouldBe expected +- 1e-12
  }

  it should "compute per-group MI under groupBy" in {
    val s = spark
    import s.implicits._
    // group a: x == y (MI = entropy > 0); group b: x independent of y
    val rows =
      Seq(("a", 0.0, 0.0), ("a", 1.0, 1.0), ("a", 0.0, 0.0), ("a", 1.0, 1.0),
        ("b", 0.0, 0.0), ("b", 0.0, 1.0), ("b", 1.0, 0.0), ("b", 1.0, 1.0))
    val out = rows.toDF("g", "x", "y")
      .groupBy($"g").agg(MIAggregate.mi($"x", $"y").as("mi"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    out("a") shouldBe math.log(2.0) +- 1e-12
    out("b") shouldBe 0.0 +- 1e-12
  }
}
