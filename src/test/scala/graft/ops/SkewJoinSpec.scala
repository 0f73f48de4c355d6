package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class SkewJoinSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "SkewJoin.salted"

  it should "produce exactly the plain inner-join result set" in {
    val s = spark
    import s.implicits._
    // heavy skew: 900 of 1000 rows share key 1
    val big = (1 to 1000).map(i =>
      (if (i <= 900) 1L else i.toLong, i)).toDF("k", "payload")
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2"),
      (5000L, "nomatch")).toDF("j", "name")
    val plain = big.join(small, col("k") === col("j"))
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val salted = SkewJoin.salted(big, small, "k", "j", salts = 7,
        saltBy = col("payload"))
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    salted should contain theSameElementsInOrderAs plain
    salted.length shouldBe 902
  }

  it should "degenerate to the plain join at salts = 1" in {
    val s = spark
    import s.implicits._
    val big = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val small = Seq((1L, 10), (2L, 20)).toDF("j", "w")
    SkewJoin.salted(big, small, "k", "j", 1, col("v")).count() shouldBe 2
  }
}
