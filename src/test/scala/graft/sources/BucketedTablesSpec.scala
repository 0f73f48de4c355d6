package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class BucketedTablesSpec extends AnyFlatSpec with Matchers
  with SparkTestBase with AdaptiveSparkPlanHelper {

  behavior of "BucketedTables"

  it should "join same-bucketed tables without any shuffle exchange" in {
    val s = spark
    import s.implicits._
    val facts = (1 to 5000).map(i => (i.toLong % 97, i)).toDF("k", "v")
    val dims = (0 to 96).map(i => (i.toLong, s"d$i")).toDF("j", "name")
    BucketedTables.writeBucketed(facts, "graft_b_facts", "k", 8)
    BucketedTables.writeBucketed(dims, "graft_b_dims", "j", 8)
    val joined = BucketedTables.bucketedJoin(
      s, "graft_b_facts", "k", "graft_b_dims", "j")
    joined.count() shouldBe 5000
    val plan = joined.queryExecution.executedPlan
    collect(plan) { case e: ShuffleExchangeLike => e } shouldBe empty
  }

  it should "produce the same result as the unbucketed join" in {
    val s = spark
    import s.implicits._
    val facts = (1 to 500).map(i => (i.toLong % 13, i)).toDF("k", "v")
    val dims = (0 to 12).map(i => (i.toLong, s"d$i")).toDF("j", "name")
    val plain = facts.join(dims, $"k" === $"j")
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    BucketedTables.writeBucketed(facts, "graft_b_f2", "k", 4)
    BucketedTables.writeBucketed(dims, "graft_b_d2", "j", 4)
    val bucketed = BucketedTables.bucketedJoin(
        s, "graft_b_f2", "k", "graft_b_d2", "j")
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    bucketed should contain theSameElementsInOrderAs plain
  }
}
