package graft.queries

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Error contracts for the sketch-family queries (no cross-engine oracle
  * exists by design — estimates are engine-specific).
  */
class SketchSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  behavior of "q_hll_users"

  it should "emit exact counts with the error-contract boolean true" in {
    val rows = graft.SparkEntry.queries("q_hll_users")(spark, dir)
      .collect()
    rows should not be empty
    // schema: (event_type, exact_users, hll_ok)
    rows.foreach { r => r.getBoolean(2) shouldBe true }
  }

  it should "estimate within 3x the configured 2% relative error" in {
    import org.apache.spark.sql.functions.{approx_count_distinct, col, count_distinct}
    val rows = Q.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("a"),
        count_distinct(col("user_id")).as("e"))
      .collect()
    rows should not be empty
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      math.abs(approx - exact) / exact should be <= 0.06
    }
  }

  behavior of "q_approx_quantiles"

  it should "emit exact percentiles with rank-contract booleans true" in {
    val rows = graft.SparkEntry.queries("q_approx_quantiles")(spark, dir)
      .collect()
    rows should not be empty
    // schema: (o_orderpriority, n, p50_exact, p95_exact, p50_ok, p95_ok)
    rows.foreach { r =>
      r.getBoolean(4) shouldBe true
      r.getBoolean(5) shouldBe true
    }
  }

  it should "track the exact percentiles within 2% relative error" in {
    import org.apache.spark.sql.functions.{col, expr, lit, percentile_approx}
    val rows = Q.t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .as("a50"),
        expr("percentile(o_totalprice, 0.5)").as("e50"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(10000))
          .as("a95"),
        expr("percentile(o_totalprice, 0.95)").as("e95"))
      .collect()
    rows should not be empty
    rows.foreach { r =>
      math.abs(r.getDouble(1) - r.getDouble(2)) /
        r.getDouble(2) should be <= 0.02
      math.abs(r.getDouble(3) - r.getDouble(4)) /
        r.getDouble(4) should be <= 0.02
    }
  }

  behavior of "contaminationPairs bloom prefilter"

  it should "produce the same pairs as the unfiltered join (no false " +
    "negatives)" in {
    // fpp = 0.5 makes the bloom coarse; the exact verify must still
    // yield exactly the oracle-checked pair set at the tight fpp
    val docs = Q.t(spark, dir, "documents")
    import org.apache.spark.sql.functions.col
    def run(fpp: Double) = graft.ops.Dedup.contaminationPairs(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", 3, 0.5, bloomFpp = fpp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    run(0.5) shouldBe run(0.001)
  }
}
