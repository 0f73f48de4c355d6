package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class PrefixSumSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  import spark.implicits._

  behavior of "withExclusivePrefix"

  it should "match the window exclusive running sum" in {
    val df = Seq((5L, 10.0), (1L, 3.0), (9L, 7.0), (3L, 100.0), (7L, 1.0))
      .toDF("k", "v").repartition(3)
    val got = PrefixSum.withExclusivePrefix(df, Seq("k"), "v")
      .select("k", "prefix")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("prefix", coalesce(sum("v").over(w), lit(0.0)))
      .select("k", "prefix")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    got shouldBe want
  }

  it should "be exact and stable for integer-valued inputs across " +
    "partitionings" in {
    def data = (0L until 300L).map(i => (i * 13 % 1000, (i % 7 + 1).toDouble))
    val a = PrefixSum.withExclusivePrefix(
        data.toDF("k", "v").repartition(2), Seq("k"), "v")
      .select("k", "prefix").collect().map(r =>
        (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = PrefixSum.withExclusivePrefix(
        data.toDF("k", "v").repartition(11), Seq("k"), "v")
      .select("k", "prefix").collect().map(r =>
        (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    a shouldBe b
  }

  it should "fail fast on a NULL value instead of silently shifting " +
    "prefixes" in {
    val df = Seq((1L, Some(3.0)), (2L, None), (3L, Some(7.0)))
      .toDF("k", "v")
    val ex = intercept[Exception] {
      PrefixSum.withExclusivePrefix(df, Seq("k"), "v").collect()
    }
    // the raise_error surfaces wrapped in Spark's execution exception
    // chain; the message must name the op and the column
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m =>
      m.contains("PrefixSum.withExclusivePrefix") && m.contains("'v'")))
  }

  behavior of "withExclusivePrefixBounded"

  private def chainMessages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(e =>
      Option(e.getMessage).toSeq ++ chainMessages(e.getCause))

  it should "equal withExclusivePrefix on the same frame" in {
    val df = Seq((5L, 10.0), (1L, 3.0), (9L, 7.0), (3L, 100.0), (7L, 1.0))
      .toDF("k", "v").repartition(3)
    val bounded = PrefixSum.withExclusivePrefixBounded(df, Seq("k"), "v",
        bound = 64)
      .select("k", "prefix")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val twoPhase = PrefixSum.withExclusivePrefix(df, Seq("k"), "v")
      .select("k", "prefix")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    bounded shouldBe twoPhase
  }

  it should "fail fast on a NULL value like the two-phase path" in {
    val df = Seq((1L, Some(3.0)), (2L, None), (3L, Some(7.0)))
      .toDF("k", "v")
    val ex = intercept[Exception] {
      PrefixSum.withExclusivePrefixBounded(df, Seq("k"), "v", bound = 64)
        .collect()
    }
    assert(chainMessages(ex).exists(m =>
      m.contains("PrefixSum.withExclusivePrefixBounded") &&
        m.contains("'v'")))
  }

  it should "raise loudly past the declared domain bound" in {
    val df = (0L until 11L).map(i => (i, 1.0)).toDF("k", "v")
    val ex = intercept[Exception] {
      PrefixSum.withExclusivePrefixBounded(df, Seq("k"), "v", bound = 10)
        .collect()
    }
    assert(chainMessages(ex).exists(m =>
      m.contains("exceeds the declared domain bound 10")))
    // exactly at the bound is fine
    val ok = PrefixSum.withExclusivePrefixBounded(
        df.limit(10), Seq("k"), "v", bound = 10)
      .select("k", "prefix").collect()
    ok should have length 10
  }
}
