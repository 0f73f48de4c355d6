package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class ShardingSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "Sharding.trainShards"

  it should "deal every row exactly once with contiguous 1-based " +
    "positions per shard" in {
    val s = spark
    import s.implicits._
    val out = Sharding.trainShards(
      (0L until 1000L).toDF("id"), "id", 8, "seed")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    out.length shouldBe 1000
    out.map(_._1).distinct.length shouldBe 1000
    out.map(_._2).distinct.sorted.foreach(sh => sh should (be >= 0 and be < 8))
    // positions within each shard are exactly 1..n
    out.groupBy(_._2).values.foreach { rows =>
      rows.map(_._3).sorted shouldBe (1 to rows.length)
    }
  }

  it should "be deterministic across partitionings and sensitive to the " +
    "seed" in {
    val s = spark
    import s.implicits._
    val df1 = (0L until 500L).toDF("id").repartition(1)
    val df7 = (0L until 500L).toDF("id").repartition(7)
    val a = Sharding.trainShards(df1, "id", 16, "s1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    val b = Sharding.trainShards(df7, "id", 16, "s1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    a shouldBe b
    val c = Sharding.trainShards(df1, "id", 16, "s2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    c should not be a
  }
}
