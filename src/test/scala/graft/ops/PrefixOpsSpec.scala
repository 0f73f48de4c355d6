package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Plan-shape contract of the DataFrame-native prefix ops: the range
  * shuffle must execute ONCE — the per-bucket window and the per-bucket
  * totals both consume the SAME exchange (Catalyst reuse), so the op
  * costs one shuffle of the input plus a P-row side computation. If a
  * future edit breaks canonical-plan equality between the two subplans
  * (e.g. a column added to only one side before the repartition), the
  * shuffle silently doubles — this spec turns that into a test failure.
  */
class PrefixOpsSpec extends AnyFlatSpec with Matchers with SparkTestBase
    with AdaptiveSparkPlanHelper {

  private def sourceShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // finalize any adaptive plan
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeLike => e
    }.size
  }

  behavior of "prefix ops"

  it should "leave no range exchange in the consuming plan" in {
    // The op pins its range bucketing eagerly; every consumer (window
    // side, totals side, and the caller) reads that one materialized
    // fact. If a future edit un-pins it, the range shuffle re-appears in
    // the consuming plan — and because the two subplans prune columns
    // differently, the re-sampled boundaries can DISAGREE between them
    // (observed: q_mann_whitney offsets off by one bucket's tail).
    val s = spark
    val df = s.range(10000).select(col("id"),
      (col("id") % 7 + 1).cast("double").as("v"))
    val out = PrefixSum.withExclusivePrefix(df, Seq("id"), "v")
    out.collect()
    val plan = out.queryExecution.executedPlan
    val ranges = collectWithSubqueries(plan) {
      case e: ShuffleExchangeLike
        if e.outputPartitioning.toString.contains("range") => e
    }
    withClue(s"range shuffles leaked into the consuming plan:\n$plan\n") {
      ranges shouldBe empty
    }
  }

  it should "agree with the window spelling on correctness" in {
    val s = spark
    val df = s.range(5000).select(col("id"),
      (col("id") % 13 + 1).cast("double").as("v"))
    val got = PrefixSum.withExclusivePrefix(df, Seq("id"), "v")
      .select("id", "prefix").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var run = 0.0
    (0L until 5000L).foreach { i =>
      got(i) shouldBe run
      run += (i % 13 + 1).toDouble
    }
  }

  it should "index rows contiguously in RowIndex" in {
    val s = spark
    val df = s.range(3333).select(col("id"))
      .repartition(7) // scrambled input partitioning
    val idx = RowIndex.withContiguousIndex(df, Seq("id"))
      .select("id", "row_idx").collect()
    idx.foreach { r => r.getLong(1) shouldBe r.getLong(0) }
  }
}
