package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much it resembles a
  * small target distribution, using hashed n-gram bag-of-features and two
  * smoothed unigram-over-buckets models.
  *
  *   weight(doc) = Σ_b c_doc(b) · ( ln p_target(b) − ln p_raw(b) )
  *
  * with p_split(b) = (c_split(b) + 1) / (T_split + B)  (add-one smoothing
  * over the B hash buckets). Resampling then keeps documents with the
  * highest weights (or samples ∝ exp(weight)); this op emits the weights.
  *
  * 100 TB shape: features are generated MAP-SIDE from the token array
  * (explode of unigrams + bigrams — no self-join), the per-split bucket
  * histogram is a B-row aggregate (B ≈ 10⁴ even in production — the paper
  * uses 10⁴ buckets for web-scale corpora), and the log-likelihood-ratio
  * table is broadcast back. The only corpus-sized shuffle is the final
  * per-doc weight aggregation (full map-side combine — docs-many groups).
  * Nothing quadratic, nothing driver-sized except the B-row LLR table.
  *
  * Determinism: the bucket hash is an md5 prefix (engine-independent);
  * the per-doc sum of c·llr terms goes through exact decimal addition so
  * the result is identical under any partitioning, and llr itself is a
  * log of ratios of exact integer counts (cross-engine delta < 1 ulp).
  */
object Dsir {

  /** Hash a feature string to one of `buckets` buckets, engine-neutrally:
    * first 8 hex digits of md5 → long → mod. DuckDB twin:
    * `CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % buckets`.
    */
  def bucketOf(feature: Column, buckets: Int): Column =
    conv(substring(md5(feature), 1, 8), 16, 10).cast("long") % buckets

  /** Unigram + bigram features (with duplicates — counts matter) of a
    * whitespace-tokenized text column.
    */
  def features(text: Column): Column =
    featuresFromTokens(TextAnalysis.tokens(text))

  /** Same features from an already-split token array. Splitting is the
    * profiled cost center of the DSIR pass (the md5 bucket hash is noise
    * next to it), so callers project the token array ONCE and build both
    * n-gram orders from it; bigrams use two `element_at` calls instead of
    * `slice`+`concat_ws` (no per-bigram array allocation).
    */
  def featuresFromTokens(toks: Column): Column =
    concat(toks,
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat(element_at(toks, i), lit(" "),
            element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>")))

  /** Per-document DSIR importance weights.
    *
    * @param docs     input table
    * @param idCol    document id column name (kept in the output)
    * @param textCol  whitespace-tokenized text column name
    * @param isTarget row predicate defining the target split (the
    *                 distribution to select FOR); everything else is raw
    * @param buckets  hash-bucket count B
    * @return one row per document: idCol, n_features, dsir_weight
    *         (exact-decimal summed, rounded to 6)
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int): DataFrame = {
    // ONE corpus pass: tokenize + explode + md5 happen exactly once; the
    // SKINNY (doc, is_t, bucket) occurrence rows are pinned and both
    // downstream aggregates read from the pin. Deliberately NOT
    // pre-aggregated to (doc, bucket, count) first: with ~hundreds of
    // features per doc that "aggregate" barely compresses (≈1 group per
    // input row at any B ≥ per-doc features), so it was a corpus-sized
    // hash-agg bought for nothing (profiled at sf1: 10.4 s for the agg vs
    // 3.3 s for the whole tokenize+explode+hash pass it fed). Per-doc
    // weights sum the broadcast llr per OCCURRENCE in exact decimal —
    // associative, partition-order independent, and the oracle mirrors
    // the identical per-occurrence spelling.
    val fb = Pin.pin(docs
      .select(col(idCol), isTarget.as("is_t"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("is_t"),
        explode(featuresFromTokens(col("toks"))).as("f"))
      .filter(col("f") =!= "")
      .select(col(idCol), col("is_t"), bucketOf(col("f"), buckets).as("b")))
    // Split histograms: B rows out, full map-side combine.
    val hist = fb.groupBy("b")
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
    val tot = hist.agg(sum("ct"), sum("cr")).head()
    val (tt, tr) = (tot.getLong(0), tot.getLong(1))
    // Smoothed log-likelihood ratio per bucket; absent buckets would have
    // llr = ln((1/(tt+B))/(1/(tr+B))) but contribute only to docs that
    // hash there — and every doc feature lands in an observed bucket by
    // construction, so the B-row table is complete for the join.
    //
    // The llr rounds ONCE PER BUCKET to a 10^-12-grain scaled long (B
    // roundings total), so the corpus-sized per-occurrence sum runs over
    // longs cast DECIMAL(38,0) — the compact long-backed path — instead
    // of a per-row double→DECIMAL(28,14) BigDecimal allocation (the
    // q_corr_matrix lesson; same exactness: integer sums are associative
    // and the single /10^12 division happens once per doc).
    val LlrScale = 1e12
    val llr = hist.select(col("b"),
      round((log((col("ct") + 1).cast("double") / (tt.toDouble + buckets)) -
        log((col("cr") + 1).cast("double") / (tr.toDouble + buckets))) *
        LlrScale, 0).cast("long").as("llr_i"))
    fb.join(broadcast(llr), "b")
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_features"),
        round(sum(col("llr_i")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / LlrScale, 6).as("dsir_weight"))
  }
}
