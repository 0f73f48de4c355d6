package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class TextAnalysisSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "shingles"

  it should "produce n-2 distinct 3-grams and handle short texts" in {
    val s = spark
    import s.implicits._
    val out = Seq("a b c d", "a b", "", "x").toDF("text")
      .select(TextAnalysis.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    out(0) should contain theSameElementsAs Seq("a b c", "b c d")
    out(1) shouldBe empty
    out(2) shouldBe empty
    out(3) shouldBe empty
  }

  behavior of "qualityScore"

  it should "score within [0,1] and rank dense text above repetitive text" in {
    val s = spark
    import s.implicits._
    val rich = (1 to 120).map(i => s"word$i").mkString(" ")
    val poor = Seq.fill(120)("the").mkString(" ")
    val out = Seq(rich, poor).toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    all(out) should (be >= 0.0 and be <= 1.0)
    out(0) should be > out(1)
  }

  behavior of "langIdOf"

  it should "detect marker-heavy languages and CJK text" in {
    TextAnalysis.langIdOf(
      "the cat is on the mat and the dog is in the house") shouldBe "en"
    TextAnalysis.langIdOf(
      "le chat est dans la maison et les chiens sont dans le jardin") shouldBe "fr"
    TextAnalysis.langIdOf("der hund und die katze das ist ein haus") shouldBe "de"
    TextAnalysis.langIdOf("你好世界你好") shouldBe "zh"
    TextAnalysis.langIdOf("zzz qqq xxx") shouldBe "und"
    TextAnalysis.langIdOf("") shouldBe "und"
  }

  behavior of "fingerprintOf"

  it should "be identical for identical texts, shared for overlapping windows" in {
    val a = "one two three four five six seven eight nine ten"
    TextAnalysis.fingerprintOf(a, 5) shouldBe TextAnalysis.fingerprintOf(a, 5)
    // a near-dup sharing the minimal window keeps the same fingerprint
    val shifted = s"zzz $a"
    // both contain all 5-gram windows of `a`, so the min over a superset
    // can only be <= — equality holds when the min window is shared
    val fa = TextAnalysis.fingerprintOf(a, 5)
    val fs = TextAnalysis.fingerprintOf(shifted, 5)
    fs should be <= fa
  }

  it should "fall back to a whole-text hash for short token streams" in {
    TextAnalysis.fingerprintOf("a b", 5) shouldBe
      TextAnalysis.rollingHash(Seq("a", "b"))
  }

  behavior of "shinglesWithDuplicates"

  it should "keep every positional n-gram occurrence (multiset, not set)" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("spam spam spam ham").toDF("text")
    val uni = df.select(TextAnalysis.shinglesWithDuplicates(col("text"), 1))
      .head().getSeq[String](0)
    uni shouldBe Seq("spam", "spam", "spam", "ham")
    val bi = df.select(TextAnalysis.shinglesWithDuplicates(col("text"), 2))
      .head().getSeq[String](0)
    bi shouldBe Seq("spam spam", "spam spam", "spam ham")
    // the distinct variant collapses exactly these duplicates
    val set = df.select(TextAnalysis.shingles(col("text"), 2))
      .head().getSeq[String](0)
    set shouldBe Seq("spam spam", "spam ham")
  }

  it should "flag a degenerate repeated-phrase doc via top-ngram fraction" in {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("rep", ("buy now " * 30).trim), ("ok",
      (1 to 60).map(i => s"tok$i").mkString(" "))).toDF("id", "text")
    val frac = df.select(col("id"),
        explode(TextAnalysis.shinglesWithDuplicates(col("text"), 2)).as("g"))
      .groupBy("id", "g").count()
      .groupBy("id")
      .agg((max("count").cast("double") / sum("count")).as("f"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    frac("rep") should be > 0.18
    frac("ok") should be < 0.05
  }

  it should "redact emails, phones, and IPv4s with typed tags" in {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      "mail a.b+c@sub.example.org or x@y.io now",
      "call +1-555-0147 twice",
      "host 10.0.255.7 and 192.168.1.1 up",
      "version 1.2 is not an ip, nor is 1.2.3",
      "no pii here"
    ).toDF("text")
    val out = df.select(TextAnalysis.redactPii(col("text")))
      .collect().map(_.getString(0))
    out shouldBe Array(
      "mail <EMAIL> or <EMAIL> now",
      "call <PHONE> twice",
      "host <IP> and <IP> up",
      "version 1.2 is not an ip, nor is 1.2.3",
      "no pii here")
  }

  behavior of "chunks"

  private def chunkRows(text: String, w: Int,
                        stride: Int): Seq[(Long, Seq[String])] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(text).toDF("text")
      .select(explode(TextAnalysis.chunks(col("text"), w, stride))
        .as("c"))
      .select(col("c.chunk_start"), col("c.toks"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[String](1).toSeq))
  }

  it should "cover every token with the configured overlap" in {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    chunkRows(text, w = 4, stride = 3) shouldBe Seq(
      (1L, Seq("t1", "t2", "t3", "t4")),
      (4L, Seq("t4", "t5", "t6", "t7")),
      (7L, Seq("t7", "t8", "t9", "t10")),
      (10L, Seq("t10")))
  }

  it should "emit one whole-document chunk when shorter than the window" in {
    chunkRows("a b c", w = 64, stride = 48) shouldBe Seq(
      (1L, Seq("a", "b", "c")))
  }

  it should "emit exactly one chunk for an empty string" in {
    // split("", " ") is [""] — one empty token, one chunk; the gate's
    // md5-of-joined-tokens then matches DuckDB's identical convention
    chunkRows("", w = 4, stride = 2) shouldBe Seq((1L, Seq("")))
  }

  it should "produce non-overlapping chunks when stride == window" in {
    val text = (1 to 6).map(i => s"t$i").mkString(" ")
    chunkRows(text, w = 3, stride = 3) shouldBe Seq(
      (1L, Seq("t1", "t2", "t3")), (4L, Seq("t4", "t5", "t6")))
  }

  it should "reject a non-positive window or stride" in {
    import org.apache.spark.sql.functions._
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.chunks(col("text"), 0, 3)
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.chunks(col("text"), 4, 0)
  }
}
