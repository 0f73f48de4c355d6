package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class DsirSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "Dsir.importanceWeights"

  private def corpus = {
    val s = spark
    import s.implicits._
    // Target dialect uses {alpha beta gamma}; raw uses {delta epsilon zeta}.
    // Mixed docs sit in between.
    Seq(
      (0L, "t", "alpha beta gamma alpha beta"),
      (1L, "t", "beta gamma alpha gamma"),
      (2L, "r", "delta epsilon zeta delta"),
      (3L, "r", "epsilon zeta delta epsilon zeta"),
      (4L, "r", "alpha beta gamma beta alpha"), // target-like raw doc
      (5L, "r", "delta alpha epsilon beta")     // mixed
    ).toDF("doc_id", "split", "text")
  }

  it should "rank target-like documents above raw-like ones" in {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
        col("split") === "t", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // The target-like raw doc must beat every raw-dialect doc …
    w(4L) should be > w(2L)
    w(4L) should be > w(3L)
    w(4L) should be > w(5L)
    // … and the pure raw-dialect docs must score negative (less
    // target-like than average).
    w(2L) should be < 0.0
    w(3L) should be < 0.0
  }

  it should "be invariant to partitioning (exact decimal sums)" in {
    val base = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("split") === "t", buckets = 64).orderBy("doc_id").collect()
    val repart = Dsir.importanceWeights(corpus.repartition(7), "doc_id",
      "text", col("split") === "t", buckets = 64).orderBy("doc_id")
      .collect()
    base.map(_.toSeq) shouldBe repart.map(_.toSeq)
  }

  it should "count unigram + bigram features per doc" in {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
        col("split") === "t", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 0: 5 tokens -> 5 unigrams + 4 bigrams = 9
    w(0L) shouldBe 9L
    // doc 1: 4 tokens -> 4 + 3 = 7
    w(1L) shouldBe 7L
  }
}
