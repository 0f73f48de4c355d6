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
  * table is broadcast back. The only corpus-sized shuffle is the
  * (doc, bucket) partial-aggregated groupBy. Nothing quadratic, nothing
  * driver-sized except the B-row LLR table.
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
    concat(TextAnalysis.shinglesWithDuplicates(text, 1),
      TextAnalysis.shinglesWithDuplicates(text, 2))

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
    // ONE corpus pass: explode + md5 happen exactly once, collapsed to
    // the per-(doc, bucket) partial aggregate, which is pinned because
    // everything downstream (split histogram, totals, per-doc weights)
    // re-references it — without the pin the corpus explode would run 3×
    // (the uncached-truth anti-pattern from VERDICT r4).
    val dc = Pin.pin(docs
      .select(col(idCol), isTarget.as("is_t"),
        explode(features(col(textCol))).as("f"))
      .filter(col("f") =!= "")
      .select(col(idCol), col("is_t"), bucketOf(col("f"), buckets).as("b"))
      .groupBy(col(idCol), col("is_t"), col("b"))
      .agg(count(lit(1)).as("c")))
    // Split histograms from the partial aggregate: B rows out.
    val hist = dc.groupBy("b")
      .agg(sum(when(col("is_t"), col("c")).otherwise(0L)).as("ct"),
        sum(when(col("is_t"), 0L).otherwise(col("c"))).as("cr"))
    val tot = hist.agg(sum("ct"), sum("cr")).head()
    val (tt, tr) = (tot.getLong(0), tot.getLong(1))
    // Smoothed log-likelihood ratio per bucket; absent buckets would have
    // llr = ln((1/(tt+B))/(1/(tr+B))) but contribute only to docs that
    // hash there — and every doc feature lands in an observed bucket by
    // construction, so the B-row table is complete for the join.
    val llr = hist.select(col("b"),
      (log((col("ct") + 1).cast("double") / (tt.toDouble + buckets)) -
        log((col("cr") + 1).cast("double") / (tr.toDouble + buckets)))
        .as("llr"))
    dc.join(broadcast(llr), "b")
      .groupBy(idCol)
      .agg(sum("c").cast("long").as("n_features"),
        round(sum((col("c") * col("llr")).cast("decimal(28,14)"))
          .cast("double"), 6).as("dsir_weight"))
  }
}
