package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class PrefixScanSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  import spark.implicits._

  behavior of "withExclusivePrefixMax"

  it should "match the window exclusive running max" in {
    val df = Seq((5L, 10L), (1L, 3L), (9L, 7L), (3L, 100L), (7L, 1L))
      .toDF("k", "v").repartition(3)
    val got = PrefixScan.withExclusivePrefixMax(df, Seq("k"), "v")
      .select("k", "prefix_max")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("prefix_max",
        coalesce(max("v").over(w), lit(Long.MinValue)))
      .select("k", "prefix_max")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    got shouldBe want
  }

  it should "be stable across partitionings" in {
    def data = (0L until 300L).map(i => (i * 13 % 1000, i % 97))
    val a = PrefixScan.withExclusivePrefixMax(
        data.toDF("k", "v").repartition(2), Seq("k"), "v")
      .select("k", "prefix_max").collect().map(r =>
        (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = PrefixScan.withExclusivePrefixMax(
        data.toDF("k", "v").repartition(11), Seq("k"), "v")
      .select("k", "prefix_max").collect().map(r =>
        (r.getLong(0), r.getLong(1))).sortBy(_._1)
    a shouldBe b
  }

  it should "admit the first row under a strict value > prefix filter" in {
    val df = Seq((1L, 5L), (2L, 4L)).toDF("k", "v")
    val sky = PrefixScan.withExclusivePrefixMax(df, Seq("k"), "v")
      .filter(col("v") > col("prefix_max"))
      .select("k").as[Long].collect().sorted
    sky shouldBe Array(1L) // k=2 dominated (4 ≤ 5); k=1 admitted
  }
}
