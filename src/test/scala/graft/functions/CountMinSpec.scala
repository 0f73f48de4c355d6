package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The CMS invariants the q_cms_by_source gate's booleans rest on:
  * no undercount ever, merge = cell-wise sum (partition-order
  * independence), determinism across runs, and per-group isolation.
  */
class CountMinSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "CountMin"

  private def words(n: Int): Seq[String] =
    (0 until n).map(i => s"w${i % 97}") // 97 distinct keys, skewed later

  it should "never undercount any key" in {
    import spark.implicits._
    val data = words(5000) ++ Seq.fill(500)("hot")
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = data.toDF("k").repartition(7)
      .select(CountMin.sketch(col("k"))).head().getSeq[Long](0).toArray
    exact.foreach { case (k, c) =>
      CountMin.estimate(sk, k) should be >= c
    }
    CountMin.total(sk) shouldBe data.size.toLong
  }

  it should "be exact when keys are few relative to the width" in {
    import spark.implicits._
    val data = Seq.fill(10)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val sk = data.toDF("k")
      .select(CountMin.sketch(col("k"))).head().getSeq[Long](0).toArray
    CountMin.estimate(sk, "a") shouldBe 10L
    CountMin.estimate(sk, "b") shouldBe 3L
    CountMin.estimate(sk, "c") shouldBe 1L
  }

  it should "produce identical sketches regardless of partitioning" in {
    import spark.implicits._
    val data = words(2000)
    def build(parts: Int): Array[Long] = data.toDF("k").repartition(parts)
      .select(CountMin.sketch(col("k"))).head().getSeq[Long](0).toArray
    build(1) shouldBe build(13)
  }

  it should "keep per-group sketches isolated under groupBy" in {
    import spark.implicits._
    val df = (Seq.fill(20)(("g1", "x")) ++ Seq.fill(5)(("g2", "y")))
      .toDF("g", "k")
    val sketches = df.groupBy("g").agg(CountMin.sketch(col("k")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
      .toMap
    CountMin.estimate(sketches("g1"), "x") shouldBe 20L
    CountMin.total(sketches("g1")) shouldBe 20L
    CountMin.estimate(sketches("g2"), "y") shouldBe 5L
    CountMin.total(sketches("g2")) shouldBe 5L
  }

  it should "skip nulls like SQL aggregates do" in {
    import spark.implicits._
    val sk = Seq(Some("a"), None, Some("a")).toDF("k")
      .select(CountMin.sketch(col("k"))).head().getSeq[Long](0).toArray
    CountMin.total(sk) shouldBe 2L
    CountMin.estimate(sk, "a") shouldBe 2L
  }
}
