package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Behavioral contract of the Naive Bayes text classifier:
  *
  *   1. perfectly separated vocabularies are recovered exactly on
  *      held-out docs (train/infer round trip);
  *   2. the model is the complete (labels × buckets) grid — zero-count
  *      buckets carry the smoothed floor, not an absent row;
  *   3. an empty test doc falls back to the prior argmax (the
  *      majority-class label).
  */
class TextClassifierSpec extends AnyFlatSpec with Matchers
    with SparkTestBase {

  behavior of "TextClassifier"

  private val B = 32

  private def corpus = {
    val s = spark
    import s.implicits._
    // label "x": words xa/xb/xc; label "y": words ya/yb/yc; "y" is the
    // majority class (more docs)
    val train = Seq(
      (1L, "xa xb xc xa", "x"), (2L, "xb xc xa xb", "x"),
      (3L, "ya yb yc ya", "y"), (4L, "yb yc ya yb", "y"),
      (5L, "yc ya yb yc", "y"))
    val test = Seq(
      (10L, "xa xc xb", "x"), (11L, "ya yc yb", "y"),
      (12L, "", "y")) // empty doc -> prior argmax = majority class "y"
    (train.toDF("doc_id", "text", "source"),
      test.toDF("doc_id", "text", "source"))
  }

  it should "recover separated classes on held-out docs and fall back " +
    "to the prior on empty docs" in {
    val (train, test) = corpus
    val model = TextClassifier.trainNaiveBayes(train, "text", "source", B)
    val pri = TextClassifier.priors(train, "source")
    val got = TextClassifier.classify(test, "doc_id", "text", model,
        pri, B)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    got shouldBe Map(10L -> "x", 11L -> "y", 12L -> "y")
  }

  it should "emit the complete labels x buckets grid with smoothed " +
    "floors on zero-count cells" in {
    val (train, _) = corpus
    val model = TextClassifier.trainNaiveBayes(train, "text", "source", B)
    model.count() shouldBe 2L * B
    // a zero-count cell's lp is ln(1) - ln(t + B) = -ln(t + B); "x" has
    // 8 training tokens
    val floors = model.filter("label = 'x'")
      .collect().map(_.getDouble(2)).min
    floors shouldBe (BigDecimal(-math.log((8 + B).toDouble))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
