package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class AsOfJoinSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "AsOfJoin.asOf"

  it should "attach the latest right row at or before each left ts" in {
    val s = spark
    import s.implicits._
    val quotes = Seq( // (key, ts, quoteId)
      ("a", 10L, 100L), ("a", 20L, 101L), ("a", 30L, 102L),
      ("b", 5L, 200L)
    ).toDF("k", "ts", "qid")
    val trades = Seq( // (key, ts, tradeId)
      ("a", 9L, 1L),   // before any quote -> null
      ("a", 10L, 2L),  // exactly at quote 100 -> 100 (<= semantics)
      ("a", 25L, 3L),  // between 20 and 30 -> 101
      ("a", 99L, 4L),  // after all -> 102
      ("b", 5L, 5L),   // equal ts other key -> 200
      ("c", 50L, 6L)   // key with no quotes -> null
    ).toDF("k", "ts", "tid")
    val out = AsOfJoin.asOf(trades, quotes, "k", "ts", "qid")
      .select("tid", "r_qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    out shouldBe Map(1L -> -1L, 2L -> 100L, 3L -> 101L, 4L -> 102L,
      5L -> 200L, 6L -> -1L)
  }

  it should "break (key, ts) ties toward the largest tie column" in {
    val s = spark
    import s.implicits._
    val right = Seq(("a", 10L, 7L), ("a", 10L, 9L), ("a", 10L, 8L))
      .toDF("k", "ts", "qid")
    val left = Seq(("a", 10L, 1L), ("a", 11L, 2L)).toDF("k", "ts", "tid")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "qid")
      .select("tid", "r_qid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 9L, 2L -> 9L)
  }

  it should "order ties numerically, not lexicographically" in {
    val s = spark
    import s.implicits._
    // "9" > "10" as strings; numerically 10 wins
    val right = Seq(("a", 1L, 9L), ("a", 1L, 10L)).toDF("k", "ts", "qid")
    val left = Seq(("a", 2L, 1L)).toDF("k", "ts", "tid")
    AsOfJoin.asOf(left, right, "k", "ts", "qid")
      .select("r_qid").head().getLong(0) shouldBe 10L
  }

  it should "keep every left row and all its columns" in {
    val s = spark
    import s.implicits._
    val right = Seq(("a", 1L, 1L)).toDF("k", "ts", "qid")
    val left = (1 to 100).map(i => ("a", i.toLong, i.toLong, s"p$i"))
      .toDF("k", "ts", "tid", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "qid")
    out.count() shouldBe 100
    out.columns.toSeq shouldBe
      Seq("k", "ts", "tid", "payload", "r_k", "r_ts", "r_qid")
  }
}
