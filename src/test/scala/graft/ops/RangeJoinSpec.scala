package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class RangeJoinSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def naive(l: DataFrame, r: DataFrame, lo: Long,
                    hi: Long): Set[(Long, Long)] =
    l.join(r, col("lk") === col("rk") &&
        col("rt") >= col("lt") + lo && col("rt") <= col("lt") + hi)
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet

  private def bandedSet(l: DataFrame, r: DataFrame, lo: Long,
                        hi: Long): Set[(Long, Long)] =
    RangeJoin.banded(l, r, "lk", "rk", "lt", "rt", lo, hi)
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet

  behavior of "RangeJoin.banded"

  it should "match the naive range join on seeded random data" in {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val l = (1L to 200L).map(i =>
      (i, rnd.nextInt(5).toLong, rnd.nextInt(100000).toLong))
      .toDF("lid", "lk", "lt")
    val r = (1L to 200L).map(i =>
      (i, rnd.nextInt(5).toLong, rnd.nextInt(100000).toLong))
      .toDF("rid", "rk", "rt")
    // backward-looking, forward-looking and straddling ranges
    for ((lo, hi) <- Seq((-5000L, -1L), (0L, 7000L), (-3000L, 3000L))) {
      bandedSet(l, r, lo, hi) shouldBe naive(l, r, lo, hi)
    }
  }

  it should "include both closed endpoints and respect key equality" in {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 1L, 1000L)).toDF("lid", "lk", "lt")
    val r = Seq(
      (10L, 1L, 900L),  // == lt + lo → in
      (11L, 1L, 1100L), // == lt + hi → in
      (12L, 1L, 899L),  // below → out
      (13L, 1L, 1101L), // above → out
      (14L, 2L, 1000L)  // wrong key → out
    ).toDF("rid", "rk", "rt")
    bandedSet(l, r, -100L, 100L) shouldBe Set((1L, 10L), (1L, 11L))
  }

  it should "reject an empty range" in {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L, 1L)).toDF("lid", "lk", "lt")
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.banded(df, df, "lk", "lk", "lt", "lt", 5L, 4L)
  }
}
