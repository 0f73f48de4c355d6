package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class SpatialLayoutSpec extends AnyFlatSpec with Matchers
    with SparkTestBase {

  import spark.implicits._

  behavior of "zValue2"

  it should "compute the Morton interleave (x odd bits, y even bits)" in {
    val df = Seq((0, 0), (1, 0), (0, 1), (3, 3), (15, 0), (0, 15), (15, 15))
      .toDF("x", "y")
      .withColumn("z", SpatialLayout.zValue2(col("x"), col("y"), 4))
    df.select("z").collect().map(_.getInt(0)).toSeq shouldBe
      Seq(0, 2, 1, 15, 170, 85, 255)
  }

  it should "match the driver-side interleave on random points" in {
    val r = new scala.util.Random(11)
    val pts = (0 until 200).map(_ => (r.nextInt(16), r.nextInt(16)))
    def morton(x: Int, y: Int): Int =
      (0 until 4).map(i =>
        (((x >> i) & 1) << (2 * i + 1)) | (((y >> i) & 1) << (2 * i))).sum
    val got = pts.toDF("x", "y")
      .withColumn("z", SpatialLayout.zValue2(col("x"), col("y"), 4))
      .collect().map(rr => (rr.getInt(0), rr.getInt(1), rr.getInt(2)))
    got.foreach { case (x, y, z) => z shouldBe morton(x, y) }
  }

  behavior of "zOrdered"

  it should "sort by z within range partitions (locality layout)" in {
    val r = new scala.util.Random(5)
    val df = (0 until 500).map(_ => (r.nextInt(16), r.nextInt(16)))
      .toDF("x", "y")
    val parts = SpatialLayout.zOrdered(df, "x", "y", 4)
      .select("z").rdd
      .mapPartitions(it => Iterator.single(it.map(_.getInt(0)).toSeq))
      .collect().filter(_.nonEmpty)
    // sorted within each partition, and partition ranges don't interleave
    parts.foreach(p => p shouldBe p.sorted)
    parts.map(_.head).toSeq shouldBe
      parts.sortBy(_.head).map(_.head).toSeq
  }
}
