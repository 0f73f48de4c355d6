package graft.ops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, MinHashLSHModel}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** PERSISTED-index near-duplicate detection — the incremental-corpus
  * operation a 100 TB pipeline actually runs nightly (r11 verdict #5):
  * build the MinHash index over the corpus ONCE, persist it, then dedup
  * each new ingest batch against the LOADED index without ever touching
  * the original corpus text again. Every other dedup operator here
  * recomputes its index per run, which is the right shape for a one-off
  * sweep and the wrong one for "dedup tonight's batch against
  * yesterday's corpus".
  *
  * The index is three parquet artifacts plus the fitted model:
  *
  *   - `meta/`  — the [[DedupIndex.MinHashConfig]] that built it (one
  *     row), so the query side shingles/hashes batches identically;
  *   - `model/` — the seeded `MinHashLSHModel` (ML persistence), so the
  *     batch side signs with the exact hash functions the corpus used;
  *   - `bands/` — the corpus band table (id, tbl, h): one narrow row
  *     per (doc, hash table) — the LSH join side;
  *   - `idx/`   — each corpus doc's tf non-zero index set (sorted), the
  *     exact-verify side.
  *
  * Query cost is O(batch) + the band join: the corpus contributes only
  * its (bounded-width) band and index rows, both read from parquet with
  * the band join's equi-keys — no corpus text scan, no corpus
  * re-shingling, no quadratic anything. Same similarity definition as
  * [[Dedup.minHashPairs]] (token n-gram shingle Jaccard, exact-verified
  * on the tf index sets), so recall contracts measured against the
  * exact truth transfer unchanged.
  */
object DedupIndex {

  /** Shingle/hash configuration persisted with the index. Defaults
    * mirror [[Dedup.minHashPairs]].
    */
  case class MinHashConfig(n: Int = 3, numHashTables: Int = 4,
                           seed: Long = 42L, numFeatures: Int = 1 << 18)

  /** (id, toks) with empty shingle sets dropped (MinHashLSH requires at
    * least one non-zero entry), then the binary HashingTF features —
    * the signing pipeline both build and query sides share.
    */
  private def featured(df: DataFrame, idCol: String, textCol: String,
                       cfg: MinHashConfig): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val docs = df.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .repartition(spark.sparkContext.defaultParallelism)
      .map { case (id, text) =>
        (id, TextAnalysis.shingleSetOf(text, cfg.n).toSeq)
      }
      .toDF("id", "toks")
      .filter(size(col("toks")) > 0)
    new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(cfg.numFeatures).setBinary(true)
      .transform(docs)
  }

  /** Sorted tf non-zero index sets: (id, idx) — the exact-verify side. */
  private def indexSets(signed: DataFrame): DataFrame = {
    val spark = signed.sparkSession
    import spark.implicits._
    signed.select(col("id"), col("tf"))
      .as[(Long, org.apache.spark.ml.linalg.Vector)]
      .map { case (id, v) =>
        val sv = v match {
          case s: org.apache.spark.ml.linalg.SparseVector => s
          case d => d.toSparse
        }
        (id, sv.indices)
      }
      .toDF("id", "idx")
  }

  /** Build the MinHash index over `corpus` and persist it at `path`
    * (overwriting a previous index — the nightly-rebuild spelling;
    * incremental APPEND of new corpus rows is the same write with
    * mode("append") on bands/idx, left to the caller's orchestration).
    */
  def buildAndSave(corpus: DataFrame, idCol: String, textCol: String,
                   path: String,
                   cfg: MinHashConfig = MinHashConfig()): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val f = featured(corpus, idCol, textCol, cfg).cache()
    try {
      val model = new MinHashLSH().setInputCol("tf").setOutputCol("sig")
        .setNumHashTables(cfg.numHashTables).setSeed(cfg.seed)
        .fit(f)
      model.write.overwrite().save(s"$path/model")
      Seq((cfg.n, cfg.numHashTables, cfg.seed, cfg.numFeatures))
        .toDF("n", "num_hash_tables", "seed", "num_features")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$path/meta")
      val signed = model.transform(f).select(col("id"), col("tf"),
        col("sig"))
      Similarity.lshBucketRows(signed, "id", "sig")
        .write.mode("overwrite").parquet(s"$path/bands")
      indexSets(signed)
        .write.mode("overwrite").parquet(s"$path/idx")
    } finally { f.unpersist(); () }
  }

  /** Fold a NEW batch of corpus documents into the existing index —
    * the step after [[dedupNewBatch]] has cleared tonight's batch: sign
    * the batch with the index's OWN persisted model/config and APPEND
    * its band and index-set rows. The existing corpus is neither read
    * nor re-signed; cost is O(batch). (The caller decides id
    * uniqueness — the index is a multiset keyed by id, exactly like
    * the corpus it mirrors.)
    */
  def appendToIndex(spark: SparkSession, newDocs: DataFrame,
                    idCol: String, textCol: String, path: String): Unit = {
    val cfg = loadConfig(spark, path)
    val model = MinHashLSHModel.load(s"$path/model")
    val signed = model.transform(featured(newDocs, idCol, textCol, cfg))
      .select(col("id"), col("tf"), col("sig")).cache()
    try {
      Similarity.lshBucketRows(signed, "id", "sig")
        .write.mode("append").parquet(s"$path/bands")
      indexSets(signed)
        .write.mode("append").parquet(s"$path/idx")
    } finally { signed.unpersist(); () }
  }

  /** The persisted config of the index at `path`. */
  def loadConfig(spark: SparkSession, path: String): MinHashConfig = {
    val r = spark.read.parquet(s"$path/meta").head()
    MinHashConfig(r.getAs[Int]("n"), r.getAs[Int]("num_hash_tables"),
      r.getAs[Long]("seed"), r.getAs[Int]("num_features"))
  }

  /** Near-duplicates of a NEW batch against the indexed corpus, reading
    * ONLY the index artifacts on the corpus side (never the corpus
    * text — provable by deleting the corpus input after buildAndSave,
    * which DedupIndexSpec does). Returns (batch_id, corpus_id,
    * jaccard_dist) at jaccard distance strictly below `maxDistance`,
    * rounded half-up to 6 decimals — [[Dedup.minHashPairs]]' exact
    * contract restricted to cross-set pairs.
    */
  def dedupNewBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                    textCol: String, path: String,
                    maxDistance: Double): DataFrame = {
    val cfg = loadConfig(spark, path)
    val model = MinHashLSHModel.load(s"$path/model")
    val corpusBands = spark.read.parquet(s"$path/bands")
    val corpusIdx = spark.read.parquet(s"$path/idx")
    crossVerify(
      model.transform(featured(batch, idCol, textCol, cfg))
        .select(col("id"), col("tf"), col("sig")),
      corpusBands, corpusIdx, maxDistance)
  }

  /** The recompute-from-scratch twin of [[dedupNewBatch]]: the same
    * batch-vs-corpus near-dup set derived fully in memory (fit, sign,
    * band-join, verify — no disk round trip). The fit is seed-
    * deterministic, so a divergence between this and the loaded-index
    * answer means exactly one thing: the persistence layer corrupted
    * signatures, bands, or index sets — which is why the gate pins
    * their equality.
    */
  def crossPairsFresh(corpus: DataFrame, batch: DataFrame, idCol: String,
                      textCol: String, maxDistance: Double,
                      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val fc = featured(corpus, idCol, textCol, cfg).cache()
    try {
      val model = new MinHashLSH().setInputCol("tf").setOutputCol("sig")
        .setNumHashTables(cfg.numHashTables).setSeed(cfg.seed)
        .fit(fc)
      val corpusSigned = model.transform(fc)
        .select(col("id"), col("tf"), col("sig"))
      crossVerify(
        model.transform(featured(batch, idCol, textCol, cfg))
          .select(col("id"), col("tf"), col("sig")),
        Similarity.lshBucketRows(corpusSigned, "id", "sig"),
        indexSets(corpusSigned), maxDistance)
    } finally { fc.unpersist(); () }
  }

  /** LSH candidate join + exact verify of a signed batch against corpus
    * band/index tables: only (id, tbl, h) rows cross the candidate
    * shuffle; the surviving pairs (orders of magnitude fewer than docs)
    * fetch both index sets once for the exact Jaccard merge — the
    * [[Dedup.minHashPairs]] join discipline, cross-set.
    */
  private def crossVerify(batchSigned: DataFrame, corpusBands: DataFrame,
                          corpusIdx: DataFrame,
                          maxDistance: Double): DataFrame = {
    val spark = batchSigned.sparkSession
    import spark.implicits._
    val batchCached = batchSigned.cache()
    try {
      val batchBands = Similarity.lshBucketRows(batchCached, "id", "sig")
        .select(col("id").as("batch_id"), col("tbl"), col("h"))
      val cands = batchBands
        .join(corpusBands.select(col("id").as("corpus_id"),
            col("tbl").as("tbl_c"), col("h").as("h_c")),
          col("tbl") === col("tbl_c") && col("h") === col("h_c"))
        .select("batch_id", "corpus_id").distinct()
      val batchIdx = indexSets(batchCached)
      cands
        .join(batchIdx, col("batch_id") === col("id")).drop("id")
        .withColumnRenamed("idx", "idx_b")
        .join(corpusIdx, col("corpus_id") === col("id")).drop("id")
        .withColumnRenamed("idx", "idx_c")
        .as[(Long, Long, Array[Int], Array[Int])]
        .flatMap { case (b, c, ib, ic) =>
          var i = 0; var j = 0; var inter = 0
          while (i < ib.length && j < ic.length) {
            if (ib(i) == ic(j)) { inter += 1; i += 1; j += 1 }
            else if (ib(i) < ic(j)) i += 1
            else j += 1
          }
          val d = 1.0 - inter.toDouble / (ib.length + ic.length - inter)
          if (d < maxDistance)
            Iterator.single((b, c,
              java.math.BigDecimal.valueOf(d)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))
          else Iterator.empty
        }
        .toDF("batch_id", "corpus_id", "jaccard_dist")
        .transform(Pin.pin) // small: only passing pairs
    } finally { batchCached.unpersist(); () }
  }
}
