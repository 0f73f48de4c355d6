package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The DSv2 connector's pushdown CONTRACTS — q_custom_source pins the
  * values; this pins the plan shapes that make the connector scale:
  * absorbed range filters (rows never generated), pruned columns
  * (never materialized), selectivity-scaled partition planning, and
  * residual predicates left for Spark.
  */
class CustomSourceSpec extends AnyFlatSpec with Matchers
  with SparkTestBase with AdaptiveSparkPlanHelper {

  behavior of "SynthSource"

  private def read(n: Long = 100000L) =
    spark.read.format("graft-synth")
      .option("n", n.toString).option("parts", "8").load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    collect(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }.head

  it should "absorb id-range filters into the scan with no residual Filter node" in {
    val q = read().filter(col("id") >= 1000L && col("id") < 5000L)
      .agg(count(lit(1)))
    q.collect()(0).getLong(0) shouldBe 4000L
    val scan = scanOf(q)
    scan.scan.description() should include("lo=1000 hi=5000")
    collect(q.queryExecution.executedPlan) {
      case f: FilterExec => f
    } shouldBe empty
  }

  it should "prune columns down to the projection" in {
    val q = read().select("bucket").distinct()
    q.count() shouldBe 100L
    scanOf(q).scan.readSchema().fieldNames.toSeq shouldBe Seq("bucket")
  }

  it should "scale partition count with pushed selectivity" in {
    val full = scanOf(read().select(count(lit(1)).as("c")))
    val tiny = scanOf(read().filter(col("id") < 3L).agg(count(lit(1))))
    full.inputRDD.getNumPartitions shouldBe 8
    tiny.inputRDD.getNumPartitions shouldBe 3
    val empty = read().filter(col("id") < 0L).agg(count(lit(1)))
    empty.collect()(0).getLong(0) shouldBe 0L
  }

  it should "absorb point lookups (EqualTo) into a single-row range" in {
    val q = read().filter(col("id") === 42L)
      .agg(count(lit(1)), min("v_int"))
    val row = q.collect()(0)
    row.getLong(0) shouldBe 1L
    row.getLong(1) shouldBe SynthTable.vInt(42L)
    val scan = scanOf(q)
    scan.scan.description() should include("lo=42 hi=43")
    scan.inputRDD.getNumPartitions shouldBe 1
  }

  it should "leave non-id predicates as residual Spark filters, still correct" in {
    val q = read().filter(col("id") < 700L && col("bucket") === 3L)
    q.count() shouldBe 7L
    collect(q.queryExecution.executedPlan) {
      case f: FilterExec => f
    } should not be empty
    q.select(min("id"), max("id")).collect()(0).toSeq shouldBe Seq(3L, 603L)
  }

  it should "generate rows matching the shared deterministic row function" in {
    val rows = read(50L).collect().sortBy(_.getLong(0))
    rows should have length 50
    rows.foreach { r =>
      val id = r.getLong(0)
      r.getLong(1) shouldBe SynthTable.bucket(id)
      r.getLong(2) shouldBe SynthTable.vInt(id)
      r.getString(3) shouldBe SynthTable.tag(id)
    }
  }
}
