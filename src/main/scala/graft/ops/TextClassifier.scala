package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** In-engine multinomial Naive Bayes over hashed token buckets — the
  * supervised corpus-filtering classifier a pretraining pipeline trains
  * on its OWN data (fastText-style domain/quality filters in CCNet and
  * the LLaMA data pipeline are exactly this shape: linear scores over
  * hashed n-gram features). [[Dsir]] is the two-distribution special
  * case (its weight is the log-likelihood ratio of two smoothed bucket
  * models); this generalizes to K labels with an argmax — train on a
  * labeled split, classify everything else, keep what lands in the
  * wanted classes.
  *
  * 100 TB shape: training is one explode + one groupBy(label, bucket)
  * — the model is a (K·B)-row table however large the corpus, with
  * full map-side combine. Inference joins exploded test tokens to the
  * model on the bucket (a K·B-row broadcast) and reduces per
  * (doc, label) — the only corpus-sized shuffle, with docs·K groups.
  *
  * Determinism (the oracle contract): bucket = engine-neutral md5
  * prefix ([[Dsir.bucketOf]]); every log term is rounded to 9 decimals
  * BEFORE summation; sums run in exact decimal arithmetic; the argmax
  * is decided on (exact decimal score, label) ordering — so Spark and
  * a SQL twin produce byte-identical predictions.
  */
object TextClassifier {

  /** Per-token log-probabilities of the smoothed per-label bucket
    * models: one row per (token-bearing label × bucket) — including
    * zero-count buckets — with
    * `lp = round(ln(c(label,bucket) + 1) − ln(t(label) + B), 9)`
    * (add-one smoothing over the B buckets, natural log). A label
    * whose training docs are all empty contributes no rows; its test
    * scores fall back to the bare prior in [[classify]].
    */
  def trainNaiveBayes(train: DataFrame, textCol: String,
                      labelCol: String, buckets: Int): DataFrame = {
    val toks = train
      .select(col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("b", Dsir.bucketOf(col("tok"), buckets))
    val counts = toks.groupBy("label", "b")
      .agg(count(lit(1)).as("c"))
    // per-label totals fold from the (K·B)-row counts table — never a
    // second pass over the exploded corpus
    val totals = counts.groupBy("label")
      .agg(sum(col("c")).as("t"))
    val allCells = totals.select("label", "t")
      .crossJoin(bucketIds(train, buckets))
    allCells
      .join(counts, Seq("label", "b"), "left")
      .na.fill(0L, Seq("c"))
      .select(col("label"), col("b"),
        round(log(col("c") + 1) - log(col("t") + lit(buckets)), 9)
          .as("lp"))
  }

  private def bucketIds(df: DataFrame, buckets: Int): DataFrame =
    df.sparkSession.range(buckets).select(col("id").cast("long").as("b"))

  /** Log label priors from the training split:
    * `lp0 = round(ln(n_docs(label)) − ln(n_docs), 9)`.
    */
  def priors(train: DataFrame, labelCol: String): DataFrame = {
    val n = train.count()
    train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
      .select(col("label"),
        round(log(col("nd")) - log(lit(n.toDouble)), 9).as("lp0"))
  }

  /** Classify `test` docs against a trained model: per doc the label
    * maximizing `lp0(label) + Σ_tokens lp(label, bucket(tok))`, the
    * sum in exact decimal over the pre-rounded terms, ties broken by
    * the LARGEST label under (score, label) ordering. Emits
    * (id, pred, score) with the winning score as a double (exact
    * decimal→double, engine-independent).
    */
  def classify(test: DataFrame, idCol: String, textCol: String,
               model: DataFrame, priorsDf: DataFrame,
               buckets: Int): DataFrame = {
    val toks = test
      .select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("b", Dsir.bucketOf(col("tok"), buckets))
    // token-level sums per (doc, label); docs with zero tokens get no
    // rows here and fall back to the bare prior via the left join below
    val sums = toks
      .join(broadcast(model), Seq("b"))
      .groupBy("id", "label")
      .agg(sum(col("lp").cast(DecimalType(28, 9))).as("s"))
    val scored = test.select(col(idCol).as("id"))
      .crossJoin(broadcast(priorsDf))
      .join(sums, Seq("id", "label"), "left")
      // re-narrow the sum to (28,9) before the add: (28,9)+(38,9) wants
      // precision 39, and Spark resolves that overflow by REDUCING the
      // result scale to 8 — silently truncating the 9th decimal the
      // oracle keeps. (28,9)+(28,9) → (29,9), lossless.
      .select(col("id"), col("label"),
        (col("lp0").cast(DecimalType(28, 9)) +
          coalesce(col("s").cast(DecimalType(28, 9)),
            lit(0).cast(DecimalType(28, 9))))
          .as("score"))
    scored.groupBy("id")
      .agg(max(struct(col("score"), col("label"))).as("w"))
      .select(col("id"), col("w.label").as("pred"),
        col("w.score").cast(DoubleType).as("score"))
  }
}
