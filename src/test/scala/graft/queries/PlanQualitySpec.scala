package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Executable form of the scale claims: the plans the engine promises are
  * the plans Catalyst actually produces on the driver's tables.
  */
class PlanQualitySpec extends AnyFlatSpec with Matchers with SparkTestBase
  with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, dir)

  behavior of "physical plans"

  it should "broadcast every dimension join in q5_nation_revenue" in {
    val plan = planOf("q5_nation_revenue").queryExecution.executedPlan
    collect(plan) { case j: BroadcastHashJoinExec => j } should have size 3
  }

  it should "push the shipdate filter into q1's parquet scan" in {
    val scans = planOf("q1_pricing_summary").queryExecution.executedPlan
      .collectLeaves().map(_.toString).filter(_.contains("Scan parquet"))
    scans should not be empty
    all(scans) should include("PushedFilters")
    exactly(1, scans) should include("LessThanOrEqual(l_shipdate")
  }

  it should "prune q1's scan to the referenced columns only" in {
    val scan = planOf("q1_pricing_summary").queryExecution.executedPlan
      .collectLeaves().map(_.toString).find(_.contains("Scan parquet")).get
    // 7 referenced columns, not all 11
    scan should include("l_returnflag")
    (scan should not).include("l_partkey")
    (scan should not).include("l_suppkey")
  }

  it should "partial-aggregate (map-side) before the shuffle in q1" in {
    val plan = planOf("q1_pricing_summary").queryExecution.executedPlan
    val aggs = collect(plan) { case a: HashAggregateExec => a }
    aggs.size should be >= 2 // partial + final
    val exchanges = collect(plan) { case e: ShuffleExchangeLike => e }
    exchanges should not be empty
  }

  it should "plan the as-of join as one shuffle + window, no join node" in {
    val plan = planOf("q_asof_join").queryExecution.executedPlan
    (plan.toString should not).include("Join")
    collect(plan) { case e: ShuffleExchangeLike => e }.size should be <= 3
  }

  it should "plan the range join as an equi-join, never a cross product" in {
    val plan = planOf("q_range_join").queryExecution.executedPlan
    val str = plan.toString
    (str should not).include("CartesianProduct")
    (str should not).include("BroadcastNestedLoopJoin")
    // the band AND the key are both join keys of the single binary join
    val joinLine = str.linesIterator
      .find(l => l.contains("Join") && l.contains("band")).getOrElse("")
    joinLine should include("band")
    joinLine should (include("bu") or include("vu"))
  }

  it should "keep the tfidf corpus-count join broadcast" in {
    val plan = planOf("q_tfidf_topterms").queryExecution.executedPlan
    collect(plan) {
      case j: BroadcastHashJoinExec => j
      case n: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => n
    } should not be empty
  }

  it should "prune partitions on a hive-layout write (no data read " +
    "outside the filtered partition)" in {
    // The 100 TB layout lever the other specs don't cover: a filter on
    // the partition column must become a PartitionFilter (directory
    // pruning at planning), not a PushedFilter (row-group skipping at
    // read). Written to a temp dir from the same fixture tables.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_part_prune").toString
    try {
      graft.queries.Q.events(spark, dir)
        .write.partitionBy("event_type").mode("overwrite").parquet(tmp)
      val scan = spark.read.parquet(tmp)
        .filter(org.apache.spark.sql.functions.col("event_type") === "view")
        .queryExecution.executedPlan
        .collectLeaves().map(_.toString).find(_.contains("Scan parquet")).get
      scan should include("PartitionFilters")
      scan should include regex "PartitionFilters: \\[[^\\]]*event_type"
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }
}
