package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class TopKSpec extends AnyFlatSpec with Matchers with SparkTestBase
  with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 7.0),
    ("c", 7L, 1.0)
  ).toDF("g", "id", "v")

  behavior of "topKPerGroup"

  it should "match the window row_number spelling (same tie order)" in {
    val got = TopK.topKPerGroup(df, Seq("g"), "v", "id", 2)
      .select("g", "rnk", "id", "v")
      .orderBy("g", "rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
    val want = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 2)
      .select("g", "rnk", "id", "v")
      .orderBy("g", "rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    got shouldBe want
  }

  it should "keep all rows of groups smaller than k" in {
    val got = TopK.topKPerGroup(df, Seq("g"), "v", "id", 5)
    got.filter(col("g") === "c").count() shouldBe 1L
    got.filter(col("g") === "b").count() shouldBe 2L
  }

  it should "plan as a two-phase object hash aggregate, never a window" in {
    val plan = TopK.topKPerGroup(df, Seq("g"), "v", "id", 2)
      .queryExecution.executedPlan
    collect(plan) { case w: WindowExec => w } shouldBe empty
    // partial + final = 2 (the map-side heap is what bounds the shuffle)
    collect(plan) { case a: ObjectHashAggregateExec => a } should have size 2
  }
}
